"""TPU-friendly 3x3/stride-2 max pooling with a gather-style backward.

torch's ``MaxPool2d(3, stride=2, padding=1)`` (the ResNet stem pool,
reference networks/resnet_encoder.py) lowers in XLA to ``reduce_window``
forward + ``select_and_scatter`` backward; the scatter is the slow half
(~5 ms of the B=48 train step, PLAN.md round-4 profile).

This module reformulates both passes as dense, fusable ops:

* forward: ONE int32 ``reduce_window`` over packed ``(value, position
  code)`` keys. For non-negative inputs the bf16 bit pattern is
  order-isomorphic to its integer view, so packing the bits above a
  4-bit position code makes window-max return the max value AND a code
  identifying which window element attained it.
* backward: the saved argmax code converts the scatter into a
  parity-grouped gather: each input pixel (h, w) = (2i + ph, 2j + pw) is
  covered by at most four windows (one per matching in-window offset);
  mask the quarter-resolution cotangent by ``argcode == code`` per
  offset, shift, and interleave the four parity planes — all elementwise
  ops plus one reshape, no scatter.

Position code: ``(h mod 4) * 4 + (w mod 4)`` is unique within any 3x3
window (span 3 < 4 per axis), so each window's cotangent is routed to
exactly ONE of its maximal elements. Among EXACTLY tied values the
chosen element may differ from torch/select_and_scatter's first-in-window
choice (the mod-4 code is not window-order monotonic when a window
straddles a mod-4 boundary); either routing is a valid subgradient and
forward values are bit-exact.

Precondition: x >= 0 (the stem pool consumes relu output, so this holds
structurally; a ``jnp.maximum(x, 0)`` guard makes violations clamp
rather than corrupt the packed ordering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool_3x3_s2_argmax(x):
    """Forward pool + argmax position code, one int32 reduce_window.

    x: (B, H, W, C) non-negative. Returns (out, argcode) where out has
    torch MaxPool2d(3, 2, 1) values (bf16 precision) and argcode is the
    winning element's (h mod 4) * 4 + (w mod 4).
    """
    orig_dtype = x.dtype
    xb = jnp.maximum(x, 0).astype(jnp.bfloat16)
    bits = lax.bitcast_convert_type(xb, jnp.uint16)
    B, H, W, C = x.shape
    hh = lax.broadcasted_iota(jnp.int32, (B, H, W, C), 1)
    ww = lax.broadcasted_iota(jnp.int32, (B, H, W, C), 2)
    code = (hh % 4) * 4 + (ww % 4)  # 4 bits, unique within any 3x3 window
    packed = (bits.astype(jnp.int32) << 8) | (15 - code)
    red = lax.reduce_window(
        packed,
        jnp.int32(-1),  # < any packed value (packed >= 0): the pad identity
        lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    out_bits = (red >> 8).astype(jnp.uint16)
    out = lax.bitcast_convert_type(out_bits, jnp.bfloat16).astype(orig_dtype)
    argcode = 15 - (red & 0xF)
    return out, argcode


def _maxpool_bwd_from_code(argcode, g, H, W):
    """dx from quarter-res cotangent g and argmax codes — gather form.

    The window at (h', w') covers input (2h' - 1 + a, 2w' - 1 + b) for
    (a, b) in {0,1,2}^2; it routes g[h', w'] there iff the argmax code
    matches that pixel's code. Input parity (ph, pw) = ((a-1) mod 2,
    (b-1) mod 2) fixes which offsets can hit a pixel: even rows only
    a=1 (window h'=i), odd rows a=0 (h'=i+1) and a=2 (h'=i).
    """
    B, Ho, Wo, C = g.shape
    assert H % 2 == 0 and W % 2 == 0 and Ho == H // 2 and Wo == W // 2
    hh = lax.broadcasted_iota(jnp.int32, (B, Ho, Wo, C), 1)
    ww = lax.broadcasted_iota(jnp.int32, (B, Ho, Wo, C), 2)
    g32 = g.astype(jnp.float32)

    def masked(a, b):
        code = ((2 * hh - 1 + a) % 4) * 4 + ((2 * ww - 1 + b) % 4)
        return jnp.where(argcode == code, g32, 0.0)

    def up(m, da, db):
        # m'[i, j] = m[i + da, j + db], zero fill past the end
        if da or db:
            m = m[:, da:, db:]
            m = jnp.pad(m, ((0, 0), (0, da), (0, db), (0, 0)))
        return m

    p00 = up(masked(1, 1), 0, 0)
    p01 = up(masked(1, 0), 0, 1) + up(masked(1, 2), 0, 0)
    p10 = up(masked(0, 1), 1, 0) + up(masked(2, 1), 0, 0)
    p11 = (
        up(masked(0, 0), 1, 1)
        + up(masked(0, 2), 1, 0)
        + up(masked(2, 0), 0, 1)
        + up(masked(2, 2), 0, 0)
    )

    top = jnp.stack([p00, p01], axis=4)  # (B, Ho, Wo, C) pairs on W parity
    bot = jnp.stack([p10, p11], axis=4)
    rows = jnp.stack([top, bot], axis=2)  # (B, Ho, 2, Wo, C, 2)
    dx = rows.transpose(0, 1, 2, 3, 5, 4).reshape(B, H, W, C)
    return dx


@jax.custom_vjp
def max_pool_3x3_s2_fast(x):
    """torch MaxPool2d(3, stride=2, padding=1) with a gather backward.

    Requires x >= 0 (true for the ResNet stem: it pools relu output).
    """
    out, _ = max_pool_3x3_s2_argmax(x)
    return out


def _mp_fwd(x):
    out, argcode = max_pool_3x3_s2_argmax(x)
    # zero-size dtype witness: custom_vjp residuals must be JAX values
    return out, (argcode, jnp.zeros((0,), x.dtype))


def _mp_bwd(res, g):
    argcode, witness = res
    H, W = 2 * argcode.shape[1], 2 * argcode.shape[2]
    dx = _maxpool_bwd_from_code(argcode, g, H, W)
    return (dx.astype(witness.dtype),)


max_pool_3x3_s2_fast.defvjp(_mp_fwd, _mp_bwd)
