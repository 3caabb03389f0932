"""Image resampling / layout ops (NHWC, jit-friendly).

Covers the reference's implicit torch ops: ``F.interpolate`` (nearest &
bilinear, both align_corners conventions), ``nn.PixelShuffle``,
``nn.ReflectionPad2d`` and 3x3 stride-1 average pooling (SSIM window).
All are expressed so XLA lowers them to cheap reshapes / gathers /
reduce_windows on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_nearest(x):
    """Nearest-neighbour 2x upsample, NHWC (reference: layers.py:196-199)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def resize_bilinear(x, out_hw, align_corners: bool = False):
    """Bilinear resize NHWC -> (B, out_h, out_w, C).

    ``align_corners=False`` matches torch ``F.interpolate(mode='bilinear')``
    defaults (used for disp upsampling, reference trainer.py:474-476);
    ``align_corners=True`` matches the fusion blocks' explicit
    ``align_corners=True`` (reference networks/fusion_v2.py:169-171).
    """
    B, H, W, C = x.shape
    out_h, out_w = out_hw
    dtype = x.dtype
    x = x.astype(jnp.float32)

    def src_coords(out_size, in_size):
        i = jnp.arange(out_size, dtype=jnp.float32)
        if align_corners:
            if out_size == 1:
                return jnp.zeros((out_size,), jnp.float32)
            return i * (in_size - 1) / (out_size - 1)
        scale = in_size / out_size
        return jnp.clip((i + 0.5) * scale - 0.5, 0.0, None)

    ys = src_coords(out_h, H)
    xs = src_coords(out_w, W)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]

    rows0 = jnp.take(x, y0, axis=1)
    rows1 = jnp.take(x, y1, axis=1)
    top = jnp.take(rows0, x0, axis=2) * (1 - wx) + jnp.take(rows0, x1, axis=2) * wx
    bot = jnp.take(rows1, x0, axis=2) * (1 - wx) + jnp.take(rows1, x1, axis=2) * wx
    out = top * (1 - wy) + bot * wy
    return out.astype(dtype)


def pixel_shuffle(x, scale: int):
    """PixelShuffle with torch channel ordering, NHWC layout.

    torch's ``nn.PixelShuffle(r)`` on NCHW interprets channels as
    (C_out, r, r); we keep the identical ordering so converted checkpoints
    match (reference: networks/fusion_v2.py:226-235, rnn.py:783-792).
    """
    B, H, W, C = x.shape
    r = scale
    c_out = C // (r * r)
    x = x.reshape(B, H, W, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, c_out
    return x.reshape(B, H * r, W * r, c_out)


def pixel_shuffle_planar(x, scale: int):
    """:func:`pixel_shuffle` on planar (B, H, C, W) tensors.

    Identical channel ordering (torch NCHW (C_out, r, r) interpretation);
    a W-padded chain tensor with logical width wl maps to logical width
    wl * r — the fill columns stay contiguous at the right edge.
    """
    B, H, C, W = x.shape
    r = scale
    c_out = C // (r * r)
    x = x.reshape(B, H, c_out, r, r, W)
    x = x.transpose(0, 1, 3, 2, 5, 4)  # B, H, r, c_out, W, r
    return x.reshape(B, H * r, c_out, W * r)


def reflect_pad_2d(x, pad: int = 1):
    """Reflection-pad H and W (reference: nn.ReflectionPad2d, layers.py:128)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool_3x3(x):
    """3x3 stride-1 VALID average pool, NHWC (SSIM window; layers.py:223-227)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0
