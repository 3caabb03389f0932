"""Family-batched bilinear warp as a lane-gather Pallas kernel.

The self-supervision step warps the SAME full-resolution source image with
4 coordinate fields (one per scale; reference trainer.py:465-515 upsamples
every disp to full res before reprojection, so all warps share (Ho, Wo)).
This kernel processes the whole scale family per source image in one
``pallas_call``:

  * the source image is loaded into VMEM once per (batch, scale-group)
    in planar bf16 (C, H, W) and reused across all scale/row programs;
  * horizontal taps come from ``jnp.take_along_axis`` along lanes — a VPU
    lane gather, Mosaic-supported for the last axis — instead of the
    one-hot MXU contraction of ops/warp.grid_sample_mxu, which spends
    O(Ho*Wo*W*H*C) MACs on what is fundamentally a gather;
  * vertical 2-tap interpolation is a masked reduction over source rows;
  * one pass emits the warped output plus the two directional-derivative
    residuals (d out/d wx, d out/d wy), so the custom-VJP backward is
    O(output) elementwise math.

Semantics match torch ``F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=False)`` — the op the reference's
loss hinges on (trainer.py:508-511). Parity-tested against ops/warp.
grid_sample in tests/test_image_warp_losses.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl

    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False


def _family_kernel(C: int, H: int, W: int, chunk: int,
                   fx_ref, fy_ref, img_ref, out_ref, rdx_ref, rdy_ref):
    """One program: `chunk` output rows of one (batch, scale) pair.

    fx/fy: (1, chunk, Wo) continuous pixel coords (pre-clamped to the
    image rectangle). img: (1, C, H, W) bf16. outs: (1, C, chunk, Wo) f32.
    """
    Wo = fx_ref.shape[-1]

    fx = fx_ref[0]                                    # (chunk, Wo) f32
    fy = fy_ref[0]
    x0f = jnp.clip(jnp.floor(fx), 0.0, float(max(W - 2, 0)))
    y0f = jnp.clip(jnp.floor(fy), 0.0, float(max(H - 2, 0)))
    wx = fx - x0f                                     # in [0, 1]
    wy = fy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    for k in range(chunk):
        xk = x0[k:k + 1, :]                           # (1, Wo)
        yk = y0[k:k + 1, :]
        wxk = wx[k:k + 1, :]
        wyk = wy[k:k + 1, :]

        iota_h = lax.broadcasted_iota(jnp.int32, (H, Wo), 0)
        m0 = (iota_h == yk).astype(jnp.float32)       # (H, Wo)
        m1 = (iota_h == yk + 1).astype(jnp.float32)
        vyw = m0 * (1.0 - wyk) + m1 * wyk
        vyd = m1 - m0

        idx0 = jnp.broadcast_to(xk, (H, Wo))
        idx1 = idx0 + 1                               # x0 <= W-2 by clamp
        for c in range(C):
            plane = img_ref[0, c].astype(jnp.float32)  # (H, W)
            a0 = jnp.take_along_axis(plane, idx0, axis=1)
            a1 = jnp.take_along_axis(plane, idx1, axis=1)
            ad = a1 - a0
            aw = a0 + wxk * ad
            out_ref[0, c, k:k + 1, :] = jnp.sum(vyw * aw, axis=0,
                                                keepdims=True)
            rdx_ref[0, c, k:k + 1, :] = jnp.sum(vyw * ad, axis=0,
                                                keepdims=True)
            rdy_ref[0, c, k:k + 1, :] = jnp.sum(vyd * aw, axis=0,
                                                keepdims=True)


def _unnormalize_clamped(grid, H, W, align_corners):
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5
    return jnp.clip(fx, 0.0, W - 1), jnp.clip(fy, 0.0, H - 1)


def _warp_family_taps(img, grids, align_corners: bool, chunk: int,
                      interpret: bool):
    """(out, rdx, rdy) each (B, S, Ho, Wo, C) f32 for grids (B,S,Ho,Wo,2)."""
    B, H, W, C = img.shape
    _, S, Ho, Wo, _ = grids.shape

    if chunk % 8 or Ho % chunk:
        chunk = Ho if Ho % 8 else 8
    fx, fy = _unnormalize_clamped(grids, H, W, align_corners)
    fx = fx.reshape(B * S, Ho, Wo)
    fy = fy.reshape(B * S, Ho, Wo)
    imgp = img.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # (B, C, H, W)

    grid = (B * S, Ho // chunk)
    coord_spec = pl.BlockSpec((1, chunk, Wo), lambda g, r: (g, r, 0))
    img_spec = pl.BlockSpec((1, C, H, W), lambda g, r: (g // S, 0, 0, 0))
    out_spec = pl.BlockSpec((1, C, chunk, Wo), lambda g, r: (g, 0, r, 0))
    out_shape = jax.ShapeDtypeStruct((B * S, C, Ho, Wo), jnp.float32)

    kernel = functools.partial(_family_kernel, C, H, W, chunk)
    out, rdx, rdy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[coord_spec, coord_spec, img_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(fx, fy, imgp)

    def to_nhwc(t):  # (B*S, C, Ho, Wo) -> (B, S, Ho, Wo, C)
        return t.reshape(B, S, C, Ho, Wo).transpose(0, 1, 3, 4, 2)

    return to_nhwc(out), to_nhwc(rdx), to_nhwc(rdy)


def _grad_masks(grids, H, W, align_corners):
    """Border masks x d(pixel)/d(grid) scale, zero where coords clamped."""
    gx = grids[..., 0].astype(jnp.float32)
    gy = grids[..., 1].astype(jnp.float32)
    if align_corners:
        rx = (gx + 1.0) * 0.5 * (W - 1)
        ry = (gy + 1.0) * 0.5 * (H - 1)
        sx, sy = (W - 1) * 0.5, (H - 1) * 0.5
    else:
        rx = ((gx + 1.0) * W - 1.0) * 0.5
        ry = ((gy + 1.0) * H - 1.0) * 0.5
        sx, sy = W * 0.5, H * 0.5
    in_x = ((rx > 0) & (rx < W - 1)).astype(jnp.float32) * sx
    in_y = ((ry > 0) & (ry < H - 1)).astype(jnp.float32) * sy
    return in_x, in_y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grid_sample_family(img, grids, align_corners: bool = False,
                       chunk: int = 8, interpret: bool = False):
    """Warp one source image with S coordinate fields in one fused kernel.

    Args:
      img:   (B, H, W, C) source image (raw data; no gradient flows into it,
             as in the reference loss graph).
      grids: (B, S, Ho, Wo, 2) normalized [-1, 1] (x, y) coordinates.

    Returns (B, S, Ho, Wo, C) warped images, f32.
    """
    out, _ = _gsf_fwd(img, grids, align_corners, chunk, interpret)
    return out


def _gsf_fwd(img, grids, align_corners, chunk, interpret):
    out, rdx, rdy = _warp_family_taps(img, grids, align_corners, chunk,
                                      interpret)
    res = (rdx, rdy, grids, jax.ShapeDtypeStruct(img.shape, img.dtype))
    return out, res


def _gsf_bwd(align_corners, chunk, interpret, res, dout):
    rdx, rdy, grids, img_spec = res
    B, H, W, C = img_spec.shape
    dout = dout.astype(jnp.float32)
    in_x, in_y = _grad_masks(grids, H, W, align_corners)
    dwx = jnp.sum(dout * rdx, axis=-1)
    dwy = jnp.sum(dout * rdy, axis=-1)
    dgrids = jnp.stack([dwx * in_x, dwy * in_y], axis=-1)
    return jnp.zeros(img_spec.shape, img_spec.dtype), dgrids


grid_sample_family.defvjp(_gsf_fwd, _gsf_bwd)
