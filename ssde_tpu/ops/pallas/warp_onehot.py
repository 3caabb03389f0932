"""One-hot MXU warp with VMEM-resident one-hots (Pallas).

The XLA formulation of the one-hot warp (ops/warp.grid_sample_mxu)
materializes a (2*Wo, W) bf16 one-hot in HBM for EVERY output row — at
KITTI shapes that is ~90 GB of HBM traffic per training step, and the op
measures HBM-bound. This kernel builds the one-hot in VMEM per output
row and contracts it there:

    ohT[x, j]  = (x == x0_j | x == x0_j + 1)        VPU, (W, 2*Wo) bf16
    tmp        = band3 @ ohT                         MXU, (C*VBAND, 2*Wo)
    taps       = masked vertical 2-tap reduction     VPU

where ``band3`` stacks a VBAND-row source band of all C channels on
sublanes (C*VBAND rows fills the MXU's M dimension). The vertical band
follows ops/warp._mxu_taps: min y0 per row; rows whose span exceeds the
band budget CLAMP to the band edge (no runtime fallback — see
warp_banded's module docstring for why; monitor via
warp_banded.band_violation_fraction, and use ``strict=True`` for exact
semantics on arbitrary grids). Emits out / d out/d wx / d out/d wy for
the O(output) custom-VJP backward. Reference op: trainer.py:508-511.
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

from .warp_banded import (
    _grad_masks,
    _taps_mxu_reference,
    _unnormalize_clamped,
)

# This kernel floors each row's band start to a multiple of 8 (dynamic
# sublane slices must be 8-aligned), which costs up to 7 rows of the
# band, so it needs its own 16-row band: warp_banded.VBAND is 8 since
# the banded kernel switched to roll-aligned bands with NO alignment
# slack — sharing that constant silently clamped ~1/8 of output rows.
VBAND = 16


def _onehot_kernel(C: int, H: int, W: int, chunk: int,
                   fx_ref, fy_ref, img_ref, out_ref, rdx_ref, rdy_ref):
    Wo = fx_ref.shape[-1]

    fx = fx_ref[0]                                     # (chunk, Wo) f32
    fy = fy_ref[0]
    x0f = jnp.clip(jnp.floor(fx), 0.0, float(max(W - 2, 0)))
    y0f = jnp.clip(jnp.floor(fy), 0.0, float(max(H - 2, 0)))
    wx = fx - x0f
    wy = fy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    iota_w = lax.broadcasted_iota(jnp.int32, (W, 2 * Wo), 0)
    iota_v = lax.broadcasted_iota(jnp.int32, (VBAND, 2 * Wo), 0)

    for k in range(chunk):
        xk = x0[k:k + 1, :]                            # (1, Wo)
        yk = y0[k:k + 1, :]
        wxk = wx[k:k + 1, :]
        wyk = wy[k:k + 1, :]
        ymin = (jnp.minimum(jnp.min(yk), H - VBAND) // 8) * 8
        ysk = jnp.clip(yk - ymin, 0, VBAND - 2)  # band-edge clamp

        # [x0 | x0+1] and [y0 | y0+1] stacked along the output axis
        x2 = jnp.concatenate([xk, xk + 1], axis=1)     # (1, 2*Wo)
        y2 = jnp.concatenate([ysk, ysk], axis=1)
        ohT = (iota_w == x2).astype(jnp.bfloat16)      # (W, 2*Wo)

        # stack all channels' band rows on sublanes -> fills MXU M dim
        band3 = img_ref[0, :, pl.ds(ymin, VBAND), :].reshape(
            C * VBAND, W)                              # bf16
        tmp = jax.lax.dot_general(
            band3, ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (C*VBAND, 2*Wo)

        m0 = (iota_v == y2).astype(jnp.float32)        # (VBAND, 2*Wo)
        m1 = (iota_v == y2 + 1).astype(jnp.float32)
        for c in range(C):
            tc = tmp[c * VBAND:(c + 1) * VBAND, :]
            sel0 = jnp.sum(m0 * tc, axis=0, keepdims=True)  # (1, 2*Wo)
            sel1 = jnp.sum(m1 * tc, axis=0, keepdims=True)
            t00, t01 = sel0[:, :Wo], sel0[:, Wo:]
            t10, t11 = sel1[:, :Wo], sel1[:, Wo:]
            ad_top = t01 - t00
            ad_bot = t11 - t10
            aw_top = t00 + wxk * ad_top
            aw_bot = t10 + wxk * ad_bot
            out_ref[0, c, k:k + 1, :] = aw_top + wyk * (aw_bot - aw_top)
            rdx_ref[0, c, k:k + 1, :] = ad_top + wyk * (ad_bot - ad_top)
            rdy_ref[0, c, k:k + 1, :] = aw_bot - aw_top


def _taps_onehot_pallas(img, fx, fy, S, chunk, interpret):
    B, H, W, C = img.shape
    G, Ho, Wo = fx.shape
    imgp = img.transpose(0, 3, 1, 2).astype(jnp.bfloat16)

    grid = (G, Ho // chunk)
    coord_spec = pl.BlockSpec((1, chunk, Wo), lambda g, r: (g, r, 0))
    img_spec = pl.BlockSpec((1, C, H, W), lambda g, r: (g // S, 0, 0, 0))
    out_spec = pl.BlockSpec((1, C, chunk, Wo), lambda g, r: (g, 0, r, 0))
    out_shape = jax.ShapeDtypeStruct((G, C, Ho, Wo), jnp.float32)

    kernel = functools.partial(_onehot_kernel, C, H, W, chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[coord_spec, coord_spec, img_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(fx, fy, imgp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grid_sample_onehot(img, grids, align_corners: bool = False,
                       chunk: int = 8, interpret: bool = False,
                       strict: bool = False):
    """Warp one source with S coordinate fields (VMEM one-hot MXU path).

    img (B, H, W, C); grids (B, S, Ho, Wo, 2) in [-1, 1].
    Returns (B, S, Ho, Wo, C) f32; no image gradient (raw data).
    ``strict``/band semantics as in warp_banded.grid_sample_banded
    (no runtime fallback: XLA executes both conditional branches).
    """
    out, _ = _gso_fwd(img, grids, align_corners, chunk, interpret, strict)
    return out


def _gso_fwd(img, grids, align_corners, chunk, interpret, strict=False):
    B, H, W, C = img.shape
    _, S, Ho, Wo, _ = grids.shape
    if chunk % 8 or Ho % chunk:
        chunk = Ho if Ho % 8 else 8

    if strict or not _PALLAS_OK or H < VBAND:
        out_p, rdx_p, rdy_p = _taps_mxu_reference(img, grids, align_corners)
    else:
        fx, fy = _unnormalize_clamped(grids, H, W, align_corners)
        out_p, rdx_p, rdy_p = _taps_onehot_pallas(
            img, fx.reshape(B * S, Ho, Wo), fy.reshape(B * S, Ho, Wo),
            S, chunk, interpret)

    def to_nhwc(t):
        return t.reshape(B, S, C, Ho, Wo).transpose(0, 1, 3, 4, 2)

    out = to_nhwc(out_p)
    res = (to_nhwc(rdx_p), to_nhwc(rdy_p), grids,
           jax.ShapeDtypeStruct(img.shape, img.dtype))
    return out, res


def _gso_bwd(align_corners, chunk, interpret, strict, res, dout):
    rdx, rdy, grids, img_spec = res
    _, H, W, _ = img_spec.shape
    dout = dout.astype(jnp.float32)
    in_x, in_y = _grad_masks(grids, H, W, align_corners)
    dwx = jnp.sum(dout * rdx, axis=-1)
    dwy = jnp.sum(dout * rdy, axis=-1)
    dgrids = jnp.stack([dwx * in_x, dwy * in_y], axis=-1)
    return jnp.zeros(img_spec.shape, img_spec.dtype), dgrids


grid_sample_onehot.defvjp(_gso_fwd, _gso_bwd)
