"""Fused Pallas TPU kernel for the bilinear warp (grid_sample).

The XLA einsum formulation of the warp (ops/warp.py grid_sample_mxu) pays
HBM round-trips for the one-hot interpolation matrices and the (M, H*C)
intermediate between its two contractions. This kernel keeps everything in
VMEM per (batch, output-row-chunk) program:

    build weighted + difference one-hots (M, W)   [VPU compares]
    tmpW = ohw @ imgT   (M, C*H)                  [MXU]
    tmpD = ohd @ imgT   (M, C*H)                  [MXU]
    per channel: masked vertical 2-tap reductions [VPU]

and emits, in one pass, the warped output plus the two directional
derivative fields the backward pass needs:

    out  = bilinear(img; x, y)
    r_dx = d out / d wx   (vertical lerp of the horizontal difference)
    r_dy = d out / d wy   (horizontal lerp of the vertical difference)

so the custom VJP backward is O(output) elementwise math with no big
contractions. Image layout inside the kernel is channel-major-transposed
(W, C*H) so the post-matmul per-channel slices are contiguous 2D (M, H)
tiles; outputs are written (chunk, C, Wo) to keep Wo on lanes, and the
wrapper transposes back with (free, fused) XLA reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False

from ..warp import _mxu_coords


def pallas_warp_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _warp_kernel(C: int, H: int, x0_ref, y0_ref, wx_ref, wy_ref, imgt_ref,
                 out_ref, rdx_ref, rdy_ref):
    chunk, Wo = x0_ref.shape[1], x0_ref.shape[2]
    W = imgt_ref.shape[1]

    xs = x0_ref[0][..., None]        # (chunk, Wo, 1)
    ys = y0_ref[0][..., None]
    wx = wx_ref[0][..., None]
    wy = wy_ref[0][..., None]

    # all tensors stay 3D (chunk, Wo, .) — Mosaic tiles the last two dims;
    # no cross-tile reshapes
    iota_w = lax.broadcasted_iota(jnp.int32, (chunk, Wo, W), 2)
    h0 = (iota_w == xs).astype(jnp.float32)
    h1 = (iota_w == xs + 1).astype(jnp.float32)
    ohw = (h0 * (1.0 - wx) + h1 * wx).astype(jnp.bfloat16)
    ohd = (h1 - h0).astype(jnp.bfloat16)

    imgt = imgt_ref[0]  # (W, C*H) bf16
    dn = (((2,), (0,)), ((), ()))
    tmp_w = lax.dot_general(ohw, imgt, dn,
                            preferred_element_type=jnp.float32)  # (chunk,Wo,CH)
    tmp_d = lax.dot_general(ohd, imgt, dn,
                            preferred_element_type=jnp.float32)

    iota_h = lax.broadcasted_iota(jnp.int32, (chunk, Wo, H), 2)
    m0 = (iota_h == ys).astype(jnp.float32)
    m1 = (iota_h == ys + 1).astype(jnp.float32)
    vyw = m0 * (1.0 - wy) + m1 * wy
    vyd = m1 - m0

    for c in range(C):
        tw = tmp_w[:, :, c * H:(c + 1) * H]
        td = tmp_d[:, :, c * H:(c + 1) * H]
        out_ref[0, :, c, :] = jnp.sum(vyw * tw, axis=2)
        rdx_ref[0, :, c, :] = jnp.sum(vyw * td, axis=2)
        rdy_ref[0, :, c, :] = jnp.sum(vyd * tw, axis=2)


def _warp_taps_pallas(img, x0, y0, wx, wy, chunk: int = 8,
                      interpret: bool = False, wo_block: int = 128):
    """(out, r_dx, r_dy), each (B, Ho, Wo, C) float32."""
    B, H, W, C = img.shape
    _, Ho, Wo = x0.shape
    # Mosaic block constraint: last two dims of a block must be (8k, 128k)
    # or equal to the array dims
    if chunk % 8 or Ho % chunk:
        chunk = Ho if Ho % 8 else 8
    if Wo % wo_block:
        wo_block = Wo
    # channel-major transpose: (B, W, C*H), so tmp slices are (M, H) tiles
    imgt = img.transpose(0, 3, 1, 2).reshape(B, C * H, W)
    imgt = jnp.swapaxes(imgt, 1, 2).astype(jnp.bfloat16)  # (B, W, C*H)

    grid = (B, Ho // chunk, Wo // wo_block)
    kernel = functools.partial(_warp_kernel, C, H)
    coord_spec = pl.BlockSpec((1, chunk, wo_block), lambda b, r, w: (b, r, w))
    out_spec = pl.BlockSpec((1, chunk, C, wo_block),
                            lambda b, r, w: (b, r, 0, w))
    out_shape = jax.ShapeDtypeStruct((B, Ho, C, Wo), jnp.float32)

    out, rdx, rdy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            coord_spec, coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, W, C * H), lambda b, r, w: (b, 0, 0)),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(x0, y0, wx, wy, imgt)

    to_nhwc = lambda t: t.transpose(0, 1, 3, 2)  # (B, Ho, Wo, C)
    return to_nhwc(out), to_nhwc(rdx), to_nhwc(rdy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grid_sample_pallas(img, grid, align_corners: bool = False, chunk: int = 8,
                       interpret: bool = False):
    """Fused-Pallas bilinear warp, torch grid_sample(border) semantics.

    Same contract as ops.warp.grid_sample / grid_sample_mxu; training fast
    path on real TPUs (use ``interpret=True`` for CPU tests). No gradient
    flows into ``img`` (always raw data here).
    """
    out, _ = _gsp_fwd(img, grid, align_corners, chunk, interpret)
    return out


def _gsp_fwd(img, grid, align_corners, chunk, interpret):
    x0, y0, wx, wy, in_x, in_y = _mxu_coords(img.shape, grid, align_corners)
    out, rdx, rdy = _warp_taps_pallas(img, x0, y0, wx, wy, chunk, interpret)
    res = (rdx, rdy, in_x, in_y, jax.ShapeDtypeStruct(img.shape, img.dtype))
    return out.astype(img.dtype), res


def _gsp_bwd(align_corners, chunk, interpret, res, dout):
    rdx, rdy, in_x, in_y, img_spec = res
    dout = dout.astype(jnp.float32)
    dwx = jnp.sum(dout * rdx, axis=-1)
    dwy = jnp.sum(dout * rdy, axis=-1)
    dgrid = jnp.stack([dwx * in_x, dwy * in_y], axis=-1)
    return jnp.zeros(img_spec.shape, img_spec.dtype), dgrid


grid_sample_pallas.defvjp(_gsp_fwd, _gsp_bwd)
