"""Fused photometric-error Pallas kernel: 0.85*SSIM + 0.15*L1 per pixel.

This is the loss half of the BASELINE north star ("SSIM+L1 photometric
error ... fused into Pallas kernels with custom VJPs"). The jnp
formulation (ops/losses.reprojection_loss, reference layers.py:218-248 +
trainer.py:517-530) lowers to reflect-pads plus FIVE reduce_windows per
(pred, target) pair, each materializing full (G, H, W, C) intermediates
in HBM — measured ~29 ms of a 140 ms B=16 train step. This kernel
computes the whole map in ONE pass over VMEM-resident planar images:

  * 3x3 reflect-pad box means via pltpu.roll + boundary masks
    (sublane/lane shifts; no pad tensors, no HBM intermediates),
  * per-channel SSIM -> clip -> 0.85/0.15 blend with L1, f32 accumulate,
  * custom VJP: the backward recomputes the pooled stats and pushes the
    upstream map back through the pools with the exact adjoint of
    reflect-pad-then-valid-box (zero-pad box + boundary fold), all in a
    second Pallas kernel — O(output) memory, no saved pool residuals.

Gradients flow into ``pred`` only; ``target`` is raw data in this loss
graph (same convention as the warp kernels' zero image gradient).
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

_C1 = 0.01**2
_C2 = 0.03**2
_SSIM_W = 0.85
_L1_W = 0.15


def _row_col_iota(H, W):
    return (
        lax.broadcasted_iota(jnp.int32, (H, W), 0),
        lax.broadcasted_iota(jnp.int32, (H, W), 1),
    )


def _roll(x, shift, axis):
    # pltpu.roll rejects negative shifts; wrap modulo the axis size
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _reflect_box3(x, row, col, H, W):
    """3x3 mean with reflect padding == reflect_pad_2d + avg_pool_3x3."""
    up = jnp.where(row == 0, _roll(x, -1, 0), _roll(x, 1, 0))
    dn = jnp.where(row == H - 1, _roll(x, 1, 0), _roll(x, -1, 0))
    v = up + x + dn
    lf = jnp.where(col == 0, _roll(v, -1, 1), _roll(v, 1, 1))
    rt = jnp.where(col == W - 1, _roll(v, 1, 1), _roll(v, -1, 1))
    return (lf + v + rt) * (1.0 / 9.0)


def _adjoint_box3(g, row, col, H, W):
    """Exact adjoint of (reflect-pad -> valid 3x3 SUM): zero-pad box sum
    plus the reflect fold-back (rows/cols 1 and H-2/W-2 absorb the border
    windows), applied separably so corners compose correctly."""
    up = jnp.where(row == 0, 0.0, _roll(g, 1, 0))
    dn = jnp.where(row == H - 1, 0.0, _roll(g, -1, 0))
    v = up + g + dn
    v = v + jnp.where(row == 1, _roll(g, 1, 0), 0.0)
    v = v + jnp.where(row == H - 2, _roll(g, -1, 0), 0.0)
    lf = jnp.where(col == 0, 0.0, _roll(v, 1, 1))
    rt = jnp.where(col == W - 1, 0.0, _roll(v, -1, 1))
    h = lf + v + rt
    h = h + jnp.where(col == 1, _roll(v, 1, 1), 0.0)
    h = h + jnp.where(col == W - 2, _roll(v, -1, 1), 0.0)
    return h


def _ssim_stats(x, y, row, col, H, W):
    mx = _reflect_box3(x, row, col, H, W)
    my = _reflect_box3(y, row, col, H, W)
    sx = _reflect_box3(x * x, row, col, H, W) - mx * mx
    sy = _reflect_box3(y * y, row, col, H, W) - my * my
    sxy = _reflect_box3(x * y, row, col, H, W) - mx * my
    u = 2.0 * mx * my + _C1          # SSIM numerator factors
    v = 2.0 * sxy + _C2
    w = mx * mx + my * my + _C1      # denominator factors
    z = sx + sy + _C2
    return mx, my, u, v, w, z


def _photo_fwd_kernel(C: int, pred_ref, targ_ref, out_ref):
    H, W = out_ref.shape[1:]
    row, col = _row_col_iota(H, W)
    acc = jnp.zeros((H, W), jnp.float32)
    for c in range(C):
        x = pred_ref[0, c].astype(jnp.float32)
        y = targ_ref[0, c].astype(jnp.float32)
        _, _, u, v, w, z = _ssim_stats(x, y, row, col, H, W)
        s = jnp.clip((1.0 - (u * v) / (w * z)) * 0.5, 0.0, 1.0)
        acc = acc + _SSIM_W * s + _L1_W * jnp.abs(x - y)
    out_ref[0] = acc * (1.0 / C)


def _photo_bwd_kernel(C: int, pred_ref, targ_ref, g_ref, dpred_ref):
    H, W = g_ref.shape[1:]
    row, col = _row_col_iota(H, W)
    g = g_ref[0].astype(jnp.float32) * (1.0 / C)
    for c in range(C):
        x = pred_ref[0, c].astype(jnp.float32)
        y = targ_ref[0, c].astype(jnp.float32)
        mx, my, u, v, w, z = _ssim_stats(x, y, row, col, H, W)
        n = u * v
        d = w * z
        s_raw = (1.0 - n / d) * 0.5
        # clip passes gradient on the closed interval (matches jax.grad
        # of jnp.clip: max/min keep the identity branch on ties)
        live = (s_raw >= 0.0) & (s_raw <= 1.0)
        inv_d = 1.0 / d
        gq = jnp.where(live, g, 0.0) * _SSIM_W * (-0.5) * (1.0 / 9.0)
        # d(n/d)/dx_i for i in window(p), split into the window-constant
        # part and the y_i / x_i cofactors:
        #   dn/dx_i = (2/9)[my*(v - u) + u*y_i],  dd/dx_i = (2/9)[mx*(z - w) + w*x_i]
        #   d s/dx_i = -(1/9)[(my(v-u) - n/d*mx(z-w))/d + (u/d) y_i - (n w/d^2) x_i]
        t_const = (my * (v - u) - n * inv_d * mx * (z - w)) * inv_d
        t_y = u * inv_d
        t_x = n * inv_d * inv_d * w
        dx = (
            _adjoint_box3(gq * t_const * 2.0, row, col, H, W)
            + _adjoint_box3(gq * t_y * 2.0, row, col, H, W) * y
            - _adjoint_box3(gq * t_x * 2.0, row, col, H, W) * x
        )
        dx = dx + g * _L1_W * jnp.sign(x - y)
        dpred_ref[0, c] = dx


def _fits_kernel(H, W):
    # sublanes multiple of 8, lanes multiple of 128 (f32 vreg tiling);
    # whole-image blocks must fit VMEM alongside ~10 live (H, W) maps
    return H % 8 == 0 and W % 128 == 0 and H * W * 4 * 16 < 14 * 2**20


def _fits_cgrid(H, W):
    """Channel-grid variant: grid (G, C), one channel per program.

    Serves large images (e.g. 320x1024, BASELINE config #5) that the
    whole-image kernel cannot: per-program VMEM is ~12 live (H, W) maps
    for ONE channel, and — the binding constraint found round 5 — the
    per-program op count stays at 1/C of the whole-image kernel's. The
    C-channel expression tree over 40-sublane-tile values crashes the
    TPU compile helper (320x512 repro: 5 box filters x 1 channel
    compiles, x 3 channels kills the subprocess), so big shapes must
    shrink the per-program program, not just the block."""
    return H % 8 == 0 and W % 128 == 0 and H * W * 4 * 12 < 24 * 2**20


def _block_rows(H, W):
    """Largest legal row-block height for the H-blocked variant, or None.

    Blocks must divide H, be sublane-aligned (multiple of 8, so the
    halo slices at BH-8 stay static-aligned), and keep ~22 live
    (BH+16, W) f32 slabs under the VMEM budget. Serves resolutions the
    whole-image kernel cannot (e.g. 320x1024, the 1024x320 training
    config)."""
    if W % 128 != 0 or H % 8 != 0:
        return None
    for bh in range(min(H, 512), 7, -8):
        if H % bh == 0 and H // bh >= 2 and (bh + 16) * W * 4 * 22 < 14 * 2**20:
            return bh
    return None


# ------------------------------------------------------------- channel grid


def _photo_fwd_kernel_cgrid(C, pred_ref, targ_ref, out_ref):
    """One (g, c) program: this channel's SSIM+L1 map, accumulated into
    the per-g output across the sequential innermost c axis."""
    c = pl.program_id(1)
    H, W = out_ref.shape[1:]
    row, col = _row_col_iota(H, W)
    x = pred_ref[0, 0].astype(jnp.float32)
    y = targ_ref[0, 0].astype(jnp.float32)
    _, _, u, v, w, z = _ssim_stats(x, y, row, col, H, W)
    s = jnp.clip((1.0 - (u * v) / (w * z)) * 0.5, 0.0, 1.0)
    pix = (_SSIM_W * s + _L1_W * jnp.abs(x - y)) * (1.0 / C)

    @pl.when(c == 0)
    def _init():
        out_ref[0] = pix

    @pl.when(c != 0)
    def _acc():
        out_ref[0] = out_ref[0] + pix


def _photo_bwd_kernel_cgrid(C, pred_ref, targ_ref, g_ref, dpred_ref):
    """One (g, c) program: this channel's dpred block (no accumulation —
    dpred is per-channel)."""
    H, W = g_ref.shape[1:]
    row, col = _row_col_iota(H, W)
    g = g_ref[0].astype(jnp.float32) * (1.0 / C)
    x = pred_ref[0, 0].astype(jnp.float32)
    y = targ_ref[0, 0].astype(jnp.float32)
    mx, my, u, v, w, z = _ssim_stats(x, y, row, col, H, W)
    n = u * v
    d = w * z
    s_raw = (1.0 - n / d) * 0.5
    live = (s_raw >= 0.0) & (s_raw <= 1.0)
    inv_d = 1.0 / d
    gq = jnp.where(live, g, 0.0) * _SSIM_W * (-0.5) * (1.0 / 9.0)
    t_const = (my * (v - u) - n * inv_d * mx * (z - w)) * inv_d
    t_y = u * inv_d
    t_x = n * inv_d * inv_d * w
    dx = (
        _adjoint_box3(gq * t_const * 2.0, row, col, H, W)
        + _adjoint_box3(gq * t_y * 2.0, row, col, H, W) * y
        - _adjoint_box3(gq * t_x * 2.0, row, col, H, W) * x
    )
    dx = dx + g * _L1_W * jnp.sign(x - y)
    dpred_ref[0, 0] = dx


def _photo_call_cgrid(pred_p, targ_p, interpret):
    G, C, H, W = pred_p.shape
    B = targ_p.shape[0]
    return pl.pallas_call(
        functools.partial(_photo_fwd_kernel_cgrid, C),
        grid=(G, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda g, c: (g, c, 0, 0)),
            pl.BlockSpec((1, 1, H, W), lambda g, c: (g % B, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda g, c: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, H, W), jnp.float32),
        interpret=interpret,
    )(pred_p, targ_p)


def _photo_bwd_call_cgrid(pred_p, targ_p, g, interpret):
    G, C, H, W = pred_p.shape
    B = targ_p.shape[0]
    return pl.pallas_call(
        functools.partial(_photo_bwd_kernel_cgrid, C),
        grid=(G, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda g_, c: (g_, c, 0, 0)),
            pl.BlockSpec((1, 1, H, W), lambda g_, c: (g_ % B, c, 0, 0)),
            pl.BlockSpec((1, H, W), lambda g_, c: (g_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda g_, c: (g_, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, C, H, W), jnp.float32),
        interpret=interpret,
    )(pred_p, targ_p, g)


# ------------------------------------------------------------------ blocked
#
# H-blocked variant for resolutions whose whole-image maps exceed VMEM
# (e.g. 320x1024). Grid (G, H/BH); each program reads its row block plus
# the previous/next blocks (clamped at the image edges, same pattern as
# conv3x3's row views), assembles a (BH+16, W) slab — 8 halo rows above
# and below keep every static slice sublane-aligned — and computes the
# same math with GLOBAL row indices driving the reflect/fold masks, so
# results are bit-identical to the whole-image kernel.


def _slab(prev_ref, cur_ref, next_ref, c, BH):
    return jnp.concatenate(
        [prev_ref[0, c, BH - 8:], cur_ref[0, c], next_ref[0, c, :8]], axis=0
    ).astype(jnp.float32)


def _photo_fwd_kernel_blocked(C, BH, H, pp, pc, pn, tp, tc, tn, out_ref):
    b = pl.program_id(1)
    W = out_ref.shape[2]
    S = BH + 16
    row = lax.broadcasted_iota(jnp.int32, (S, W), 0) + b * BH - 8
    col = lax.broadcasted_iota(jnp.int32, (S, W), 1)
    acc = jnp.zeros((BH, W), jnp.float32)
    for c in range(C):
        x = _slab(pp, pc, pn, c, BH)
        y = _slab(tp, tc, tn, c, BH)
        _, _, u, v, w, z = _ssim_stats(x, y, row, col, H, W)
        s = jnp.clip((1.0 - (u * v) / (w * z)) * 0.5, 0.0, 1.0)
        pix = _SSIM_W * s + _L1_W * jnp.abs(x - y)
        acc = acc + pix[8:BH + 8]
    out_ref[0] = acc * (1.0 / C)


def _photo_bwd_kernel_blocked(C, BH, H, pp, pc, pn, tp, tc, tn,
                              gp, gc, gn, dpred_ref):
    b = pl.program_id(1)
    W = gc.shape[2]
    S = BH + 16
    row = lax.broadcasted_iota(jnp.int32, (S, W), 0) + b * BH - 8
    col = lax.broadcasted_iota(jnp.int32, (S, W), 1)
    g_slab = jnp.concatenate(
        [gp[0, BH - 8:], gc[0], gn[0, :8]], axis=0
    ).astype(jnp.float32) * (1.0 / C)
    for c in range(C):
        x = _slab(pp, pc, pn, c, BH)
        y = _slab(tp, tc, tn, c, BH)
        mx, my, u, v, w, z = _ssim_stats(x, y, row, col, H, W)
        n = u * v
        d = w * z
        s_raw = (1.0 - n / d) * 0.5
        live = (s_raw >= 0.0) & (s_raw <= 1.0)
        inv_d = 1.0 / d
        gq = jnp.where(live, g_slab, 0.0) * _SSIM_W * (-0.5) * (1.0 / 9.0)
        t_const = (my * (v - u) - n * inv_d * mx * (z - w)) * inv_d
        t_y = u * inv_d
        t_x = n * inv_d * inv_d * w
        dx = (
            _adjoint_box3(gq * t_const * 2.0, row, col, H, W)
            + _adjoint_box3(gq * t_y * 2.0, row, col, H, W) * y
            - _adjoint_box3(gq * t_x * 2.0, row, col, H, W) * x
        )
        dx = dx + g_slab * _L1_W * jnp.sign(x - y)
        dpred_ref[0, c] = dx[8:BH + 8]


def _photo_call(pred_p, targ_p, interpret):
    G, C, H, W = pred_p.shape
    B = targ_p.shape[0]
    if not _fits_kernel(H, W) and _fits_cgrid(H, W):
        return _photo_call_cgrid(pred_p, targ_p, interpret)
    if _fits_kernel(H, W):
        return pl.pallas_call(
            functools.partial(_photo_fwd_kernel, C),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, C, H, W), lambda g: (g, 0, 0, 0)),
                pl.BlockSpec((1, C, H, W), lambda g: (g % B, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, H, W), jnp.float32),
            interpret=interpret,
        )(pred_p, targ_p)
    BH = _block_rows(H, W)
    nH = H // BH

    def pv(off, mod=None):
        if mod is None:
            return lambda g, b: (g, 0, jnp.clip(b + off, 0, nH - 1), 0)
        return lambda g, b: (g % mod, 0, jnp.clip(b + off, 0, nH - 1), 0)

    spec = lambda m: pl.BlockSpec((1, C, BH, W), m)
    return pl.pallas_call(
        functools.partial(_photo_fwd_kernel_blocked, C, BH, H),
        grid=(G, nH),
        in_specs=[spec(pv(o)) for o in (-1, 0, 1)]
        + [spec(pv(o, B)) for o in (-1, 0, 1)],
        out_specs=pl.BlockSpec((1, BH, W), lambda g, b: (g, b, 0)),
        out_shape=jax.ShapeDtypeStruct((G, H, W), jnp.float32),
        interpret=interpret,
    )(pred_p, pred_p, pred_p, targ_p, targ_p, targ_p)


def _photo_bwd_call(pred_p, targ_p, g, interpret):
    G, C, H, W = pred_p.shape
    B = targ_p.shape[0]
    if not _fits_kernel(H, W) and _fits_cgrid(H, W):
        return _photo_bwd_call_cgrid(pred_p, targ_p, g, interpret)
    if _fits_kernel(H, W):
        return pl.pallas_call(
            functools.partial(_photo_bwd_kernel, C),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, C, H, W), lambda g: (g, 0, 0, 0)),
                pl.BlockSpec((1, C, H, W), lambda g: (g % B, 0, 0, 0)),
                pl.BlockSpec((1, H, W), lambda g: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, C, H, W), lambda g: (g, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, C, H, W), jnp.float32),
            interpret=interpret,
        )(pred_p, targ_p, g)
    BH = _block_rows(H, W)
    nH = H // BH

    def pv(off, mod=None):
        if mod is None:
            return lambda g, b: (g, 0, jnp.clip(b + off, 0, nH - 1), 0)
        return lambda g, b: (g % mod, 0, jnp.clip(b + off, 0, nH - 1), 0)

    spec4 = lambda m: pl.BlockSpec((1, C, BH, W), m)
    spec3 = lambda m3: pl.BlockSpec((1, BH, W), m3)

    def gv(off):
        return lambda g_, b: (g_, jnp.clip(b + off, 0, nH - 1), 0)

    return pl.pallas_call(
        functools.partial(_photo_bwd_kernel_blocked, C, BH, H),
        grid=(G, nH),
        in_specs=[spec4(pv(o)) for o in (-1, 0, 1)]
        + [spec4(pv(o, B)) for o in (-1, 0, 1)]
        + [spec3(gv(o)) for o in (-1, 0, 1)],
        out_specs=pl.BlockSpec((1, C, BH, W), lambda g_, b: (g_, 0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((G, C, H, W), jnp.float32),
        interpret=interpret,
    )(pred_p, pred_p, pred_p, targ_p, targ_p, targ_p, g, g, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def photometric_error_planar(pred_p, targ_p, interpret: bool = False):
    """Per-pixel 0.85*SSIM + 0.15*L1, channel-averaged, planar layout.

    pred_p (G, C, H, W): warped source frames (G = pairs*B, any pair-major
    order with batch fastest); targ_p (B, C, H, W): frame-0 target, read
    by program g as ``targ_p[g % B]``. Returns (G, H, W) f32. Gradient
    flows into ``pred_p`` only. Caller must check :func:`fits_photometric`.
    """
    return _photo_call(pred_p, targ_p, interpret)


def _pe_fwd(pred_p, targ_p, interpret):
    return _photo_call(pred_p, targ_p, interpret), (pred_p, targ_p)


def _pe_bwd(interpret, res, g):
    pred_p, targ_p = res
    dpred = _photo_bwd_call(pred_p, targ_p, g.astype(jnp.float32), interpret)
    return dpred.astype(pred_p.dtype), jnp.zeros_like(targ_p)


photometric_error_planar.defvjp(_pe_fwd, _pe_bwd)


def fits_photometric(H, W):
    """Static predicate: can the fused kernel serve this resolution?

    Whole-image kernel for shapes whose maps fit VMEM; channel-grid
    variant for larger images like 320x1024 (whose C-channel program
    crashes the TPU compiler — see _fits_cgrid); H-blocked variant
    (identical math, global-row masks) beyond that."""
    return _PALLAS_OK and (
        _fits_kernel(H, W) or _fits_cgrid(H, W)
        or _block_rows(H, W) is not None
    )


def reprojection_loss_pallas(pred, target, interpret: bool = False):
    """NHWC adapter matching ops.losses.reprojection_loss(no_ssim=False).

    pred (G, H, W, C) vs target (B, H, W, C) with G a multiple of B
    (batch-fastest pair stacking); returns (G, H, W, 1) f32.
    """
    pred_p = pred.astype(jnp.float32).transpose(0, 3, 1, 2)
    targ_p = target.astype(jnp.float32).transpose(0, 3, 1, 2)
    out = photometric_error_planar(pred_p, targ_p, interpret)
    return out[..., None]
