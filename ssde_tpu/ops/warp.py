"""Differentiable bilinear warp (``grid_sample``) for TPU.

JAX has no native ``grid_sample``; this is the single hottest op of the
self-supervision pipeline (reference: ``F.grid_sample(...,
padding_mode="border")`` at trainer.py:508-511, trainer_gru.py:901-904).

The implementation here is a gather-based pure-jnp version whose backward
pass (scatter-add through the gather) is derived by JAX autodiff — correct
and already fast under XLA. A fused Pallas kernel for the forward+backward
photometric path lives in ``ssde_tpu.ops.pallas``.

Semantics match torch ``F.grid_sample(mode='bilinear',
padding_mode='border')``:
  * grid is (B, H_out, W_out, 2) with (x, y) in [-1, 1];
  * ``align_corners=False`` (the torch default the reference inherits):
    unnormalized x = ((x + 1) * W - 1) / 2;
  * border padding: sample coordinates are clamped to the image rectangle.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(img, grid, align_corners: bool = False):
    """Bilinear sample ``img`` (B, H, W, C) at ``grid`` (B, Ho, Wo, 2) -> (B, Ho, Wo, C)."""
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5

    # border padding: clamp the continuous coordinate to the valid rectangle
    fx = jnp.clip(fx, 0.0, W - 1)
    fy = jnp.clip(fy, 0.0, H - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, Ho * Wo)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(B, Ho, Wo, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.astype(img.dtype)
