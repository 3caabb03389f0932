"""Fused 3x3 SAME conv (+bias +activation) Pallas kernel, planar layout.

XLA:TPU lowers small-channel 3x3 convs through a materialized im2col —
the depth decoder's 16/32-channel convs at 640x192 accessed 13 GB/step
fwd+bwd (measured cost_analysis), ~10x the true activation traffic. This
kernel keeps the halo in VMEM: one program per output row builds the
(9*Cin, W) tap stack from three row views (reflect or zero padding
resolved in the BlockSpec index maps + lane masks) and contracts it on
the MXU.

Layout contract: activations are PLANAR ``(B, H, C, W)`` — W on lanes
(multiple of 128), C on sublanes (multiple of 8 preferred) — so chains of
convs compose with no per-op transposes; ``ssde_tpu.models.depth_decoder``
transposes once at entry/exit.

Backward: custom VJP. dW runs as a second Pallas kernel (same tap-stack,
contracted against the cotangent row over W — an excellent MXU shape);
dx is the zero-pad conv of the cotangent with rotated weights (this same
kernel in "zero" mode) plus the reflect-pad fold-back strips computed in
XLA (O(H+W) work). Reference op: layers.py:121-136 (Conv3x3).
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


def _shift_w(x, dx, W, reflect: bool, wl: int):
    """Value at column c of the dx-shifted row stack (x is (K, W)).

    ``wl`` is the LOGICAL width: the right boundary behaves as if the
    tensor were wl columns wide (columns wl..W-1 are zero fill, see
    the chain-padding contract in :func:`conv3x3_zero_chain`). Callers
    without fill pass wl == W.
    """
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if dx == -1:  # reads column c-1; col 0 reads -1 -> reflect 1 / zero
        rolled = pltpu.roll(x, 1, 1)
        if reflect:
            return jnp.where(col == 0, pltpu.roll(x, W - 1, 1), rolled)
        return jnp.where(col == 0, jnp.zeros_like(x), rolled)
    if dx == 1:  # reads column c+1; col wl-1 reads wl -> reflect wl-2 / zero
        rolled = pltpu.roll(x, W - 1, 1)
        if reflect:
            return jnp.where(col == wl - 1, pltpu.roll(x, 1, 1), rolled)
        return jnp.where(col == wl - 1, jnp.zeros_like(x), rolled)
    return x


def _tap_stack(up, mid, dn, h, H, W, reflect: bool, wl: int):
    """(9*Cin, W) im2col stack for one output row, dx-major / dy-minor.

    The stack is built and contracted in f32: Mosaic's rotate is 32-bit
    only, and its verifier rejects bf16 operands feeding an f32-preferred
    dot here; these small-channel convs are bandwidth-bound (HBM traffic
    is set by the bf16 refs), so the f32 MXU pass costs nothing.
    """
    if not reflect:
        up = jnp.where(h == 0, jnp.zeros_like(up), up)
        dn = jnp.where(h == H - 1, jnp.zeros_like(dn), dn)
    band3 = jnp.concatenate([up, mid, dn], axis=0).astype(jnp.float32)
    return jnp.concatenate(
        [_shift_w(band3, dx, W, reflect, wl) for dx in (-1, 0, 1)], axis=0
    )


def _fwd_kernel(H, W, act, reflect, wl, RB, up_ref, mid_ref, dn_ref, wt_ref,
                b_ref, out_ref):
    h = pl.program_id(1)
    for r in range(RB):
        x_col = _tap_stack(up_ref[r, 0], mid_ref[r, 0], dn_ref[r, 0], h, H, W,
                           reflect, wl)
        res = lax.dot_general(
            wt_ref[...].astype(jnp.float32), x_col,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        res = res + b_ref[...].astype(jnp.float32)
        if act == "elu":
            # (expm1 is not lowered by Mosaic; exp-1 in f32 is accurate to
            # ~1e-7 on the negative branch, same as XLA's elu here)
            res = jnp.where(res > 0, res, jnp.exp(res) - 1.0)
        elif act == "sigmoid":
            res = jax.nn.sigmoid(res)
        elif act == "tanh":
            res = jnp.tanh(res)
        elif act == "relu":
            res = jnp.maximum(res, 0.0)
        if wl != W:
            # keep the fill columns zero so the chain-padding invariant
            # holds for the next conv in the chain
            col = lax.broadcasted_iota(jnp.int32, res.shape, 1)
            res = jnp.where(col < wl, res, 0.0)
        out_ref[r, 0] = res.astype(out_ref.dtype)


def _dw_kernel(H, W, reflect, wl, RB, up_ref, mid_ref, dn_ref, g_ref, dw_ref):
    h = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, h == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for r in range(RB):
        x_col = _tap_stack(up_ref[r, 0], mid_ref[r, 0], dn_ref[r, 0], h, H, W,
                           reflect, wl)
        # one accumulating store per row: Mosaic only fuses ref += dot
        # when the dot is the whole accumulator expression
        dw_ref[...] += lax.dot_general(
            x_col, g_ref[r, 0].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _row_views(H):
    """Three BlockSpec index maps giving rows h-1, h, h+1 (edges clamped to
    the REFLECT source; zero mode masks them in-kernel instead)."""
    up = lambda b, h: (b, jnp.where(h == 0, 1, h - 1), 0, 0)
    mid = lambda b, h: (b, h, 0, 0)
    dn = lambda b, h: (b, jnp.where(h == H - 1, H - 2, h + 1), 0, 0)
    return up, mid, dn


def _batch_block(B, Cin, Cout, W):
    """Rows of the SAME (h-1, h, h+1) window across RB batch items run in
    one program: the per-program work grows RB-fold while the grid (and
    its launch/prologue overhead — the per-(b,h)-row grid measured
    launch-bound at B=48, PLAN.md) shrinks RB-fold. Bounded by scoped
    VMEM (16M): double-buffered in/out blocks plus one f32 tap stack PER
    unrolled row (Mosaic keeps them all live), plus the weights."""
    budget = 12 * 2**20
    per_item = 2 * (3 * Cin + Cout) * W * 2 + 9 * Cin * W * 4
    fixed = Cout * 9 * Cin * 2
    for rb in (8, 6, 4, 3, 2):
        if B % rb == 0 and fixed + rb * per_item < budget:
            return rb
    return 1


def _conv_rows(x, wt, b2, act, reflect, interpret, wl=None):
    B, H, Cin, W = x.shape
    Cout = wt.shape[0]
    RB = _batch_block(B, Cin, Cout, W)
    up, mid, dn = _row_views(H)
    spec_x = [pl.BlockSpec((RB, 1, Cin, W), m) for m in (up, mid, dn)]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H, W, act, reflect, wl or W, RB),
        grid=(B // RB, H),
        in_specs=spec_x + [
            pl.BlockSpec((Cout, 3 * 3 * Cin), lambda b, h: (0, 0)),
            pl.BlockSpec((Cout, 1), lambda b, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RB, 1, Cout, W), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Cout, W), x.dtype),
        interpret=interpret,
    )(x, x, x, wt, b2)


def _dw_call(x, g, reflect, interpret, wl=None):
    B, H, Cin, W = x.shape
    Cout = g.shape[2]
    RB = _batch_block(B, Cin, Cout, W)
    up, mid, dn = _row_views(H)
    spec_x = [pl.BlockSpec((RB, 1, Cin, W), m) for m in (up, mid, dn)]
    return pl.pallas_call(
        functools.partial(_dw_kernel, H, W, reflect, wl or W, RB),
        grid=(B // RB, H),
        in_specs=spec_x + [
            pl.BlockSpec((RB, 1, Cout, W), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9 * Cin, Cout), lambda b, h: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9 * Cin, Cout), jnp.float32),
        interpret=interpret,
    )(x, x, x, g)


def _pack_w(w):
    """(3,3,Cin,Cout) HWIO -> (Cout, 9*Cin) matching the dx-major stack."""
    w = jnp.asarray(w)
    return jnp.transpose(w, (3, 1, 0, 2)).reshape(w.shape[3], -1)


def _unpack_dw(dw, Cin, Cout):
    """(9*Cin, Cout) accumulator -> (3,3,Cin,Cout) HWIO."""
    return jnp.transpose(dw.reshape(3, 3, Cin, Cout), (1, 0, 2, 3))


def _rot_w(w):
    """Weights of the data-gradient conv: rotate 180°, swap io."""
    return jnp.transpose(jnp.asarray(w)[::-1, ::-1], (0, 1, 3, 2))


def fits_conv3x3(H, W, Cin, Cout):
    """Static predicate: the planar kernel serves this shape.

    Any W works (conv3x3 pads the lane dim to a 128 multiple with one
    reflect column; the pad region is sliced off and its cotangent is
    zero); the bound is the VMEM tap stack.
    """
    Wp = -(-W // 128) * 128
    return _PALLAS_OK and H >= 2 and W >= 2 and (9 * Cin) * Wp * 4 < 4 * 2**20


def conv3x3(x, w, b, act: str = "none", interpret: bool = False):
    """conv3x3_planar on any width: pads W up to a 128 multiple.

    The first pad column holds the right-edge reflect value x[..., W-2]
    (read by output column W-1's dx=+1 tap), the rest zeros; outputs past
    W are garbage and sliced off, so their cotangent is zero and the pad
    construction's autodiff routes the reflect column's gradient back to
    x[..., W-2] exactly.
    """
    B, H, C, W = x.shape
    Wp = -(-W // 128) * 128
    if Wp == W:
        return conv3x3_planar(x, w, b, act, interpret)
    fill = jnp.zeros((B, H, C, Wp - W - 1), x.dtype)
    xp = jnp.concatenate([x, x[..., W - 2:W - 1], fill], axis=3)
    return conv3x3_planar(xp, w, b, act, interpret)[..., :W]


def conv3x3_zero(x, w, b, act: str = "none", interpret: bool = False):
    """conv3x3_planar_zero on any width: pads W up to a 128 multiple.

    Zero padding means the fill columns are plain zeros (output column
    W-1's dx=+1 tap must read 0); outputs past W are garbage and sliced
    off, so their cotangent is zero.
    """
    B, H, C, W = x.shape
    Wp = -(-W // 128) * 128
    if Wp == W:
        return conv3x3_planar_zero(x, w, b, act, interpret)
    fill = jnp.zeros((B, H, C, Wp - W), x.dtype)
    xp = jnp.concatenate([x, fill], axis=3)
    return conv3x3_planar_zero(xp, w, b, act, interpret)[..., :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _c3z_core(x, w, b, act: str, interpret: bool, wl: int):
    wt = _pack_w(w)
    b2 = (jnp.zeros((w.shape[3], 1), x.dtype) if b is None
          else jnp.asarray(b).reshape(-1, 1))
    return _conv_rows(x, wt, b2, act, False, interpret, wl)


def _c3z_fwd(x, w, b, act, interpret, wl):
    out = _c3z_core(x, w, b, act, interpret, wl)
    return out, (x, w, b is not None, out)


def _c3z_bwd(act, interpret, wl, saved, g):
    x, w, has_b, out = saved
    Cin, Cout = w.shape[2], w.shape[3]
    ag = _act_grad(act, out.astype(jnp.float32))
    gp = (g.astype(jnp.float32) * ag if ag is not None
          else g.astype(jnp.float32)).astype(x.dtype)
    if wl != x.shape[3]:
        # out's fill columns are masked constants, so their cotangent is
        # meaningless (nonzero garbage arrives via downstream elementwise
        # ops) — kill it before it reaches dw/db/dx
        col = lax.broadcasted_iota(jnp.int32, gp.shape, 3)
        gp = jnp.where(col < wl, gp, 0).astype(x.dtype)

    db = jnp.sum(gp.astype(jnp.float32), axis=(0, 1, 3))
    dw = _unpack_dw(_dw_call(x, gp, False, interpret, wl), Cin, Cout)
    dx = _conv_rows(gp, _pack_w(_rot_w(w)).astype(x.dtype),
                    jnp.zeros((Cin, 1), x.dtype), "none", False, interpret,
                    wl)
    w_arr = jnp.asarray(w)
    return (dx.astype(x.dtype), dw.astype(w_arr.dtype),
            db.astype(w_arr.dtype) if has_b else None)


_c3z_core.defvjp(_c3z_fwd, _c3z_bwd)


def conv3x3_planar_zero(x, w, b, act: str = "none", interpret: bool = False):
    """SAME zero-pad 3x3 conv + bias + activation, planar layout.

    The zero-pad twin of :func:`conv3x3_planar` (the GRU/LSTM cell and
    ResidualConvUnit convs are zero-pad ``nn.Conv``s in the reference,
    rnn.py:101-140, fusion_v2.py:11-43). x (B, H, Cin, W); w (3, 3, Cin,
    Cout) HWIO; b (Cout,) or None. Backward is simpler than reflect: the
    adjoint of a zero-pad SAME conv is the zero-pad SAME conv of the
    cotangent with rotated weights — no border fold-backs.
    """
    return _c3z_core(x, w, b, act, interpret, x.shape[3])


def conv3x3_zero_chain(x, w, b, act: str = "none", wl: int = 0,
                       interpret: bool = False):
    """Zero-pad conv on a CHAIN-PADDED planar tensor.

    Chain-padding contract: the tensor is physically W columns wide
    (W % 128 == 0) but logically ``wl`` wide; columns wl..W-1 are zero
    fill maintained BY this kernel (outputs there are masked to zero) and
    by every elementwise op whose operands all keep zero fill. This lets
    a whole conv chain at, e.g., logical width 320 run on one 384-wide
    buffer with no per-conv pad/slice copies — entry pads once, exit
    slices once. The boundary column wl-1 convolves as the true right
    edge (its dx=+1 tap reads zero).
    """
    W = x.shape[3]
    assert W % 128 == 0 and 2 <= wl <= W
    return _c3z_core(x, w, b, act, interpret, wl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_planar(x, w, b, act: str = "none", interpret: bool = False):
    """SAME reflect-pad 3x3 conv + bias + activation, planar layout.

    x (B, H, Cin, W); w (3, 3, Cin, Cout) HWIO (same params as the NHWC
    modules); b (Cout,). Returns (B, H, Cout, W). ``act``: "none" | "elu"
    | "sigmoid" | "tanh". Gradients flow to x, w and b.
    """
    wt = _pack_w(w)
    return _conv_rows(x, wt, jnp.asarray(b).reshape(-1, 1), act, True,
                      interpret)


def _act_grad(act, out, res=None):
    if act == "none":
        return None  # multiply by 1
    if act == "elu":
        # elu' from the OUTPUT: 1 where out>0 else out+1 (= exp(pre))
        return jnp.where(out > 0, 1.0, out + 1.0)
    if act == "sigmoid":
        return out * (1.0 - out)
    if act == "tanh":
        return 1.0 - out * out
    if act == "relu":
        # relu' from the OUTPUT: out > 0 (the measure-zero pre==0 tie
        # matches XLA's convention of 0 there only when out==0)
        return (out > 0).astype(jnp.float32)
    raise ValueError(act)


def _c3_fwd(x, w, b, act, interpret):
    out = conv3x3_planar(x, w, b, act, interpret)
    return out, (x, w, out)


def _c3_bwd(act, interpret, saved, g):
    """VJP via the full-correlation decomposition.

    Let T be the FULL correlation of the cotangent with the rotated
    weights on the (H+2)x(W+2) padded grid (indices -1..H / -1..W). The
    adjoint of reflect-pad-then-valid-conv is

        dx[i,j] = T[i,j]                                  (zero-pad core)
                + [i==1]   T[-1,j] + [i==H-2] T[H,j]      (row folds)
                + [j==1]   T[i,-1] + [j==W-2] T[i,W]      (col folds)
                + the four corner terms T[-1,-1] etc.

    The core is this same Pallas kernel in zero mode; each fold is a
    zero-padded 1-D correlation strip (T[-1,·] only sees g row 0, etc.);
    the corner terms are single products. Folds are applied as masked
    elementwise adds so they fuse (no full-tensor dynamic-update-slice).
    """
    x, w, out = saved
    B, H, Cin, W = x.shape
    Cout = w.shape[3]
    ag = _act_grad(act, out.astype(jnp.float32))
    gp = (g.astype(jnp.float32) * ag if ag is not None
          else g.astype(jnp.float32)).astype(x.dtype)

    db = jnp.sum(gp.astype(jnp.float32), axis=(0, 1, 3))
    dw = _unpack_dw(_dw_call(x, gp, True, interpret), Cin, Cout)

    wr = _rot_w(w)
    dx = _conv_rows(gp, _pack_w(wr).astype(x.dtype),
                    jnp.zeros((Cin, 1), x.dtype), "none", False, interpret)
    dx = dx.astype(jnp.float32)
    gpf = gp.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    def shift_zero(c, o, axis):
        # value at index j of c[j - o], zero outside
        if o == 0:
            return c
        rolled = jnp.roll(c, o, axis)
        idx = lax.broadcasted_iota(jnp.int32, c.shape, axis)
        n = c.shape[axis]
        bad = idx == (0 if o > 0 else n - 1)
        return jnp.where(bad, 0.0, rolled)

    def strip(g_line, w_line, axis):
        # T[-1,·]-style strip: 1-D zero-padded correlation along `axis`
        # g_line (B, Cout, L) [axis=2] or (B, L, Cout)->einsum handles;
        # w_line (3, Cin, Cout); returns (B, Cin, L)
        out_s = 0.0
        for o in (-1, 0, 1):
            contrib = jnp.einsum("bol,io->bil", g_line, w_line[o + 1])
            out_s = out_s + shift_zero(contrib, o, 2)
        return out_s

    # row folds: T[-1, j] = sum_o w[0, o+1] . g[0, j-o]  (j interior)
    top = strip(gpf[:, 0], wf[0], 2)               # gpf[:, 0] is (B,Cout,W)
    bot = strip(gpf[:, H - 1], wf[2], 2)           # lands on row H-2
    # corner terms T[-1,-1] etc. land on (1,1)/(1,W-2)/(H-2,1)/(H-2,W-2):
    # fold them into the row strips (tiny strip-sized updates)
    top = top.at[:, :, 1].add(
        jnp.einsum("bo,io->bi", gpf[:, 0, :, 0], wf[0, 0]))
    top = top.at[:, :, W - 2].add(
        jnp.einsum("bo,io->bi", gpf[:, 0, :, W - 1], wf[0, 2]))
    bot = bot.at[:, :, 1].add(
        jnp.einsum("bo,io->bi", gpf[:, H - 1, :, 0], wf[2, 0]))
    bot = bot.at[:, :, W - 2].add(
        jnp.einsum("bo,io->bi", gpf[:, H - 1, :, W - 1], wf[2, 2]))
    # col folds: T[i, -1] = sum_o w[o+1, 0] . g[i-o, 0] (i interior)
    lef = strip(gpf[:, :, :, 0].transpose(0, 2, 1), wf[:, 0], 2)   # (B,Cin,H)
    rig = strip(gpf[:, :, :, W - 1].transpose(0, 2, 1), wf[:, 2], 2)

    # apply as masked elementwise adds (fuse; no full-tensor update-slice)
    row = lax.broadcasted_iota(jnp.int32, (1, H, 1, 1), 1)
    colw = lax.broadcasted_iota(jnp.int32, (1, 1, 1, W), 3)
    dx = dx + jnp.where(row == 1, top[:, None], 0.0)
    dx = dx + jnp.where(row == H - 2, bot[:, None], 0.0)
    dx = dx + jnp.where(colw == 1, lef.transpose(0, 2, 1)[..., None], 0.0)
    dx = dx + jnp.where(colw == W - 2, rig.transpose(0, 2, 1)[..., None], 0.0)

    w_arr = jnp.asarray(w)
    return (dx.astype(x.dtype), dw.astype(w_arr.dtype),
            db.astype(w_arr.dtype))


conv3x3_planar.defvjp(_c3_fwd, _c3_bwd)
