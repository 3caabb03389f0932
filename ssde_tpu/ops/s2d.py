"""Space-to-depth conv forms for the wide-spatial / narrow-channel stages.

XLA:TPU packs NHWC channels onto vector lanes: a 16-channel conv uses
16/128 = 12.5% of each vreg (and of each MXU pass), which is why the
depth decoder's top levels dominate the step (46.7 ms of the 68 ms
encdec slice at B=48, PLAN.md). The space-to-depth (s2d) view trades
2x2 spatial blocks for 4x channels.

Form. With group-major s2d view xs[b, i, j, (di*2+dj)*C + c] =
x[b, 2i+di, 2j+dj, c], a 3x3 stride-1 SAME conv on (H, W, C) is EXACTLY
ONE 3x3 conv on the (H/2, W/2, 4C) view with a statically scattered
(3, 3, 4Ci, 4Co) kernel: the original tap y[2i+di] += w[u+1] .
x[2i+di+u] reads s2d block row i + floor((di+u)/2) (offset in {-1,0,1}),
sub-row (di+u) % 2, so each output group's taps land on a 2x2 block
sub-support of the 3x3 scattered kernel (the rest stays zero). Canonical
layout in, canonical layout out — no slice/concat glue, which is where a
2x2-conv formulation loses its win (measured: the bare 2x2 conv is 1.4
ms at B=48 192x640x16->16 but +8.8 ms of output regrouping; this 3x3
form runs 2.68 ms fwd+bwd vs 7.27 NHWC). The 16/9 FLOP overhead is free
at these bandwidth-bound shapes but loses by Ci=128 (48x160: 2.46 vs
1.36 NHWC) — callers cut over by channel count.

Nearest-x2 upsample fuses into the consuming conv: conv3x3(upsample(x))
taps read up[2i+di+u] = x[i + floor((di+u)/2)], so a stride-1 3x3 conv
on the HALF-RES tensor with a per-group TAP-SUMMED kernel (u in {0,1}
both land on offset 0 for di=0, etc.) emits the s2d view of the
full-res conv output directly — the 4x upsample write never happens.

Everything here is plain XLA (conv + static reshapes), so autodiff
provides the backward; the weight scatters are trace-time
constant-indexed placements, O(|w|) per step.

Reflection padding (reference layers.py:121-136) is restored the same
way as models/common.conv3x3_reflect_same: the zero-pad conv drops
exactly the taps that read a reflected row/col, and each border row/col
gets the missing 1-D contribution added back — applied in the s2d view
via masked adds on (block-row, channel-group) coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def space_to_depth(x):
    """(B, H, W, C) -> group-major s2d view (B, H/2, W/2, 4C)."""
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2,
                                                        4 * C)


def depth_to_space(xs):
    """Group-major s2d view (B, Hs, Ws, 4C) -> (B, 2Hs, 2Ws, C)."""
    B, Hs, Ws, C4 = xs.shape
    C = C4 // 4
    x = xs.reshape(B, Hs, Ws, 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * Hs, 2 * Ws, C)


def scatter_w3(w):
    """(3, 3, Ci, Co) HWIO -> the (3, 3, 4Ci, 4Co) s2d-to-s2d kernel."""
    Ci, Co = w.shape[2], w.shape[3]
    W3 = jnp.zeros((3, 3, 4, Ci, 4, Co), w.dtype)
    for di in (0, 1):
        for u in (-1, 0, 1):
            oi, si = 1 + (di + u) // 2, (di + u) % 2
            for dj in (0, 1):
                for v in (-1, 0, 1):
                    oj, sj = 1 + (dj + v) // 2, (dj + v) % 2
                    W3 = W3.at[oi, oj, si * 2 + sj, :,
                               di * 2 + dj, :].set(w[u + 1, v + 1])
    return W3.reshape(3, 3, 4 * Ci, 4 * Co)


def scatter_w3_up(w):
    """(3, 3, Ci, Co) -> the (3, 3, Ci, 4Co) upsample-fused kernel.

    Taps of conv3x3(nearest_up(x)) that read the same half-res source row
    sum: for output group di, offsets floor((di+u)/2) collide for two of
    the three u (and likewise along j), so each scattered slot ADDS.
    """
    Ci, Co = w.shape[2], w.shape[3]
    W3 = jnp.zeros((3, 3, Ci, 4, Co), w.dtype)
    for di in (0, 1):
        for u in (-1, 0, 1):
            oi = 1 + (di + u) // 2
            for dj in (0, 1):
                for v in (-1, 0, 1):
                    oj = 1 + (dj + v) // 2
                    W3 = W3.at[oi, oj, :, di * 2 + dj, :].add(w[u + 1, v + 1])
    return W3.reshape(3, 3, Ci, 4 * Co)


def _conv(x, w, dims=("NHWC", "HWIO", "NHWC")):
    return lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=dims)


def _row_from_s2d(xs, r, C):
    """Full-res row r as (B, W, C) from a group-major s2d view."""
    di = r % 2
    blk = xs[:, r // 2, :, di * 2 * C:(di * 2 + 2) * C]   # (B, Ws, 2C)=(dj,c)
    B, Ws = blk.shape[0], blk.shape[1]
    return blk.reshape(B, 2 * Ws, C)


def _col_from_s2d(xs, c, C):
    """Full-res column c as (B, H, C) from a group-major s2d view."""
    dj = c % 2
    col = xs[:, :, c // 2]                                 # (B, Hs, 4C)
    g0 = col[..., dj * C:(dj + 1) * C]                     # di=0
    g1 = col[..., (2 + dj) * C:(3 + dj) * C]               # di=1
    stk = jnp.stack([g0, g1], axis=2)                      # (B, Hs, 2, C)
    B, Hs = col.shape[0], col.shape[1]
    return stk.reshape(B, 2 * Hs, C)


@jax.custom_vjp
def _s2d_borders(xs):
    """Border strips + corner pixels of the FULL-RES tensor, from its s2d
    view — with a hand-written VJP.

    Forward extracts full-res row 1, row H-2, col 1, col W-2 and the four
    (1,1)/(H-2,1)/(1,W-2)/(H-2,W-2) pixels (everything the reflect fix
    reads). Autodiff's adjoint of each extraction is a full-size zeros
    scatter-accumulate — four extra O(B*Hs*Ws*4C) passes per conv that XLA
    does not fuse (measured ~2.6 ms/conv of the decoder's ~10 ms border
    overhead at B=48). The custom backward assembles ALL strip cotangents
    into one tensor with four masked adds instead.
    """
    B, Hs, Ws, C4 = xs.shape
    Ci = C4 // 4
    H, W = 2 * Hs, 2 * Ws

    def px(r, c):
        return xs[:, r // 2, c // 2,
                  ((r % 2) * 2 + (c % 2)) * Ci:
                  ((r % 2) * 2 + (c % 2) + 1) * Ci]

    return (_row_from_s2d(xs, 1, Ci), _row_from_s2d(xs, H - 2, Ci),
            _col_from_s2d(xs, 1, Ci), _col_from_s2d(xs, W - 2, Ci),
            (px(1, 1), px(H - 2, 1), px(1, W - 2), px(H - 2, W - 2)))


def _s2d_borders_fwd(xs):
    # the residual must be a JAX-typed pytree; xs itself is free (it is
    # already saved by the main conv's VJP — XLA shares the buffer)
    return _s2d_borders(xs), xs


def _s2d_borders_bwd(res, cots):
    (B, Hs, Ws, C4), dtype = res.shape, res.dtype
    Ci = C4 // 4
    H = 2 * Hs
    drow1, drowm2, dcol1, dcolm2, (dc11, dcm21, dc1m2, dcm2m2) = cots
    f32 = jnp.float32
    # corner cotangents ride the column strips (positions 1 / H-2 are
    # interior to those strips)
    dcol1 = dcol1.astype(f32).at[:, 1].add(dc11.astype(f32))
    dcol1 = dcol1.at[:, H - 2].add(dcm21.astype(f32))
    dcolm2 = dcolm2.astype(f32).at[:, 1].add(dc1m2.astype(f32))
    dcolm2 = dcolm2.at[:, H - 2].add(dcm2m2.astype(f32))

    # full-res row 1 = block row 0, di=1 -> s2d channels [2Ci:4Ci]
    zer2 = jnp.zeros((B, Ws, 2 * Ci), f32)
    top = jnp.concatenate([zer2, drow1.astype(f32).reshape(B, Ws, 2 * Ci)],
                          axis=-1)
    # full-res row H-2 = block row Hs-1, di=0 -> channels [0:2Ci]
    bot = jnp.concatenate([drowm2.astype(f32).reshape(B, Ws, 2 * Ci), zer2],
                          axis=-1)
    # full-res col 1 = block col 0, dj=1 -> groups (0,1)=[Ci:2Ci] (di=0)
    # and (1,1)=[3Ci:4Ci] (di=1)
    zc = jnp.zeros((B, Hs, Ci), f32)
    c1 = dcol1.reshape(B, Hs, 2, Ci)
    lef = jnp.concatenate([zc, c1[:, :, 0], zc, c1[:, :, 1]], axis=-1)
    # full-res col W-2 = block col Ws-1, dj=0 -> groups (0,0)/(1,0)
    cm2 = dcolm2.reshape(B, Hs, 2, Ci)
    rig = jnp.concatenate([cm2[:, :, 0], zc, cm2[:, :, 1], zc], axis=-1)

    row = lax.broadcasted_iota(jnp.int32, (1, Hs, 1, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, Ws, 1), 2)
    zero = jnp.zeros((), f32)
    dxs = (jnp.where(row == 0, top[:, None], zero)
           + jnp.where(row == Hs - 1, bot[:, None], zero)
           + jnp.where(col == 0, lef[:, :, None], zero)
           + jnp.where(col == Ws - 1, rig[:, :, None], zero))
    return (dxs.astype(dtype),)


_s2d_borders.defvjp(_s2d_borders_fwd, _s2d_borders_bwd)


@jax.custom_vjp
def _fr_borders(x):
    """Edge rows/cols + corner pixels of a (B, Hs, Ws, C) tensor, with a
    one-pass masked-add VJP (same rationale as :func:`_s2d_borders`)."""
    return (x[:, 0], x[:, -1], x[:, :, 0], x[:, :, -1],
            (x[:, 0, 0], x[:, -1, 0], x[:, 0, -1], x[:, -1, -1]))


def _fr_borders_fwd(x):
    return _fr_borders(x), x


def _fr_borders_bwd(res, cots):
    (B, Hs, Ws, C), dtype = res.shape, res.dtype
    drow0, drowm1, dcol0, dcolm1, (dc00, dcm0, dc0m, dcmm) = cots
    f32 = jnp.float32
    dcol0 = dcol0.astype(f32).at[:, 0].add(dc00.astype(f32))
    dcol0 = dcol0.at[:, -1].add(dcm0.astype(f32))
    dcolm1 = dcolm1.astype(f32).at[:, 0].add(dc0m.astype(f32))
    dcolm1 = dcolm1.at[:, -1].add(dcmm.astype(f32))
    row = lax.broadcasted_iota(jnp.int32, (1, Hs, 1, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, Ws, 1), 2)
    zero = jnp.zeros((), f32)
    dx = (jnp.where(row == 0, drow0.astype(f32)[:, None], zero)
          + jnp.where(row == Hs - 1, drowm1.astype(f32)[:, None], zero)
          + jnp.where(col == 0, dcol0[:, :, None], zero)
          + jnp.where(col == Ws - 1, dcolm1[:, :, None], zero))
    return (dx.astype(dtype),)


_fr_borders.defvjp(_fr_borders_fwd, _fr_borders_bwd)


def _fix(strip, w_taps):
    """Missing-tap 1-D correction: strip (B, L, Ci) reflect-padded along L,
    contracted with w_taps (3, Ci, Co). Same as conv3x3_reflect_same."""
    p = jnp.pad(strip, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    L = strip.shape[1]
    return sum(
        jnp.einsum("blc,cd->bld", p[:, d:d + L], w_taps[d]) for d in range(3)
    )


def _apply_reflect_fix(out, w, Co, row1, rowm2, col1, colm2, corners):
    """Add the reflect border corrections onto an s2d-view conv output.

    ``row1``/``rowm2`` are full-res input rows 1 and H-2 as (B, W, Ci);
    ``col1``/``colm2`` full-res cols 1 and W-2 as (B, H, Ci); ``corners``
    the four (B, Ci) input pixels at (1,1), (H-2,1), (1,W-2), (H-2,W-2).
    Everything lands on border rows/cols of the OUTPUT, expressed in s2d
    coordinates: full-res row 0 = block row 0 groups (0, dj), etc.
    """
    B, Hs, Ws, _ = out.shape
    wf = w.astype(out.dtype)
    top = _fix(row1, wf[0])                                # (B, W, Co)
    bot = _fix(rowm2, wf[2])
    lef = _fix(col1, wf[:, 0])                             # (B, H, Co)
    rig = _fix(colm2, wf[:, 2])
    # corner taps counted by both a row and a column fix: dedup on the
    # column strips (O(B*Co) updates)
    H = 2 * Hs
    for tgt, pos, xv, ky, kx in (
        (0, 0, corners[0], 0, 0), (0, H - 1, corners[1], 2, 0),
        (1, 0, corners[2], 0, 2), (1, H - 1, corners[3], 2, 2),
    ):
        dup = jnp.einsum("bc,cd->bd", xv.astype(out.dtype), wf[ky, kx])
        if tgt == 0:
            lef = lef.at[:, pos].add(-dup)
        else:
            rig = rig.at[:, pos].add(-dup)

    zeros2 = jnp.zeros((B, Ws, 2 * Co), out.dtype)
    top_s = jnp.concatenate([top.reshape(B, Ws, 2 * Co), zeros2], axis=-1)
    bot_s = jnp.concatenate([zeros2, bot.reshape(B, Ws, 2 * Co)], axis=-1)
    zc = jnp.zeros((B, Hs, Co), out.dtype)
    lefr = lef.reshape(B, Hs, 2, Co)                       # (di, co) at dj=0
    lef_s = jnp.concatenate([lefr[:, :, 0], zc, lefr[:, :, 1], zc], axis=-1)
    rigr = rig.reshape(B, Hs, 2, Co)                       # at dj=1
    rig_s = jnp.concatenate([zc, rigr[:, :, 0], zc, rigr[:, :, 1]], axis=-1)

    # masked elementwise adds fuse into the conv epilogue (same trick as
    # common.conv3x3_reflect_same)
    row = lax.broadcasted_iota(jnp.int32, (1, Hs, 1, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, Ws, 1), 2)
    zero = jnp.zeros((), out.dtype)
    out = out + jnp.where(row == 0, top_s[:, None], zero)
    out = out + jnp.where(row == Hs - 1, bot_s[:, None], zero)
    out = out + jnp.where(col == 0, lef_s[:, :, None], zero)
    out = out + jnp.where(col == Ws - 1, rig_s[:, :, None], zero)
    return out


def _finish(out, b, act):
    if b is not None:
        out = out + jnp.tile(b.astype(out.dtype), 4)
    if act == "elu":
        out = jnp.where(out > 0, out, jnp.expm1(out))
    elif act == "sigmoid":
        out = 1.0 / (1.0 + jnp.exp(-out))
    elif act == "relu":
        out = jnp.maximum(out, 0)
    elif act == "tanh":
        out = jnp.tanh(out)
    else:
        assert act == "none", act
    return out


def conv3x3_s2d(xs, w, b=None, act: str = "none", reflect: bool = True):
    """SAME 3x3 conv (+bias +activation) on a group-major s2d view.

    xs (B, Hs, Ws, 4Ci) — the s2d view of a (B, 2Hs, 2Ws, Ci) tensor;
    w (3, 3, Ci, Co) HWIO (IDENTICAL params to the NHWC path — the view
    change lives entirely in this op); b (Co,) or None. Returns the s2d
    view (B, Hs, Ws, 4Co) of the conv output. ``reflect`` selects the
    reference's reflection padding (layers.py:121-136) vs zero padding.
    """
    B, Hs, Ws, C4 = xs.shape
    Ci, Co = C4 // 4, w.shape[3]
    assert w.shape[:3] == (3, 3, Ci), (w.shape, xs.shape)
    out = _conv(xs, scatter_w3(w).astype(xs.dtype))
    if reflect:
        row1, rowm2, col1, colm2, corners = _s2d_borders(xs)
        out = _apply_reflect_fix(out, w, Co, row1, rowm2, col1, colm2,
                                 corners)
    return _finish(out, b, act)


def conv3x3_s2d_up(x_fr, skip_s2d, w, b=None, act: str = "none",
                   reflect: bool = True):
    """3x3 conv of concat([nearest_up2x(x_fr), skip]) -> s2d view, fused.

    x_fr (B, Hs, Ws, Cx) is the PRE-upsample tensor at full (block) res;
    skip_s2d (B, Hs, Ws, 4Cs) the s2d view of the skip feature (same res
    as the upsampled x), or None. w (3, 3, Cx+Cs, Co) — the parameters of
    the plain NHWC conv on the concatenated input. The nearest upsample
    becomes a tap-summed kernel on x_fr (scatter_w3_up); the 4x-sized
    upsampled tensor is never materialized. Returns (B, Hs, Ws, 4Co).
    """
    B, Hs, Ws, Cx = x_fr.shape
    Cs = skip_s2d.shape[-1] // 4 if skip_s2d is not None else 0
    Co = w.shape[3]
    assert w.shape[:3] == (3, 3, Cx + Cs), (w.shape, x_fr.shape, Cs)
    wx, ws = w[:, :, :Cx], w[:, :, Cx:]
    out = _conv(x_fr, scatter_w3_up(wx).astype(x_fr.dtype))
    if skip_s2d is not None:
        out = out + _conv(skip_s2d, scatter_w3(ws).astype(skip_s2d.dtype))
    if reflect:
        H, W = 2 * Hs, 2 * Ws

        # borders of the virtual concat([up(x), skip]) input: nearest
        # upsample maps full-res row r to x_fr[r // 2]. Strip/corner reads
        # go through the one-pass-VJP extractors (see _s2d_borders).
        fr = _fr_borders(x_fr) if Cx else None
        sk = _s2d_borders(skip_s2d) if Cs else None
        # x_fr rows/cols that the four fix lines read: rows 1, H-2 ->
        # block rows 0, Hs-1; cols 1, W-2 -> block cols 0, Ws-1
        fr_row = {1: fr[0], H - 2: fr[1]} if Cx else None
        fr_col = {1: fr[2], W - 2: fr[3]} if Cx else None
        fr_px = ({(1, 1): fr[4][0], (H - 2, 1): fr[4][1],
                  (1, W - 2): fr[4][2], (H - 2, W - 2): fr[4][3]}
                 if Cx else None)
        sk_row = {1: sk[0], H - 2: sk[1]} if Cs else None
        sk_col = {1: sk[2], W - 2: sk[3]} if Cs else None
        sk_px = ({(1, 1): sk[4][0], (H - 2, 1): sk[4][1],
                  (1, W - 2): sk[4][2], (H - 2, W - 2): sk[4][3]}
                 if Cs else None)

        def vrow(r):
            parts = [fr_row[r].repeat(2, axis=1)[:, :W]] if Cx else []
            if Cs:
                parts.append(sk_row[r])
            return (jnp.concatenate(parts, axis=-1) if len(parts) > 1
                    else parts[0])

        def vcol(c):
            parts = [fr_col[c].repeat(2, axis=1)[:, :H]] if Cx else []
            if Cs:
                parts.append(sk_col[c])
            return (jnp.concatenate(parts, axis=-1) if len(parts) > 1
                    else parts[0])

        def vpx(r, c):
            parts = [fr_px[(r, c)]] if Cx else []
            if Cs:
                parts.append(sk_px[(r, c)])
            return (jnp.concatenate(parts, axis=-1) if len(parts) > 1
                    else parts[0])

        out = _apply_reflect_fix(
            out, w, Co, vrow(1), vrow(H - 2), vcol(1), vcol(W - 2),
            (vpx(1, 1), vpx(H - 2, 1), vpx(1, W - 2), vpx(H - 2, W - 2)),
        )
    return _finish(out, b, act)
