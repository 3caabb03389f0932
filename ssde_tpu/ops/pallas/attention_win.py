"""Fused 3x3 windowed per-channel attention Pallas kernel, planar layout.

The reference's AttentionConv (networks/attention.py:9-61; invoked k=3
inside every GRU fusion block, rnn.py:578-583) computes, per channel,
a softmax over the 3x3 neighbourhood:

    logit_i = q * (k_i + rel_i)        (elementwise, per channel)
    out     = sum_i softmax_i(logit) * v_i

XLA executes the streaming-softmax formulation (models/attention.py) as
~27 separate HBM passes over the full map (9 shifted logits consumed
twice, plus the exp/accumulate chain), and ``jax.checkpoint`` replays
them all in backward — measured ~740 ms of the v9 GRU step at B=8,T=3.
This kernel holds a row-block's window in VMEM: q, k, v are each read
from HBM exactly once forward (q, k, v, g once + dq, dk, dv written once
backward), with all 9 taps materialized as lane-rolls of the row band.

Layout contract (same as ops/pallas/conv3x3): planar ``(B, H, C, W)`` —
W on lanes, C on sublanes. k/v arrive PADDED to (B, H+2, C, W+2) with
the +1 ring carrying the key/value conv bias (the reference pads x with
zeros *before* the 1x1 convs, so the ring value IS the bias; we pad the
conv output with the bias value, which is identical and keeps the ring's
cotangent flowing back to the bias parameter through the pad's autodiff).
All widths are chain-padded to a 128 multiple; ``wl`` is the logical
output width (fill columns stay zero).

Grid shape: a per-(b, row) grid is launch-bound (~8 us/program measured;
19 ms for one B=8 192x640x32 fwd+bwd) — programs process an RH-row block
instead, with the halo rows taken from the NEXT row-block via a second
BlockSpec view (static in-kernel row selects; rows live on the
outside-tile dim so slicing is free).

Backward is a custom VJP fed by SAVED forward products: the forward
emits the 9 softmax weights (as a (RB, RH, 9C, W) block) next to the
output, and the backward consumes s and out directly — no logits/max/exp
recompute (the recompute variant was VPU-arithmetic-bound: 16 ms bwd vs
1.4 ms fwd at 8x192x640x32; the saved-s backward measures ~3.3 ms).
Output row h's window reads padded rows h..h+2, so padded row rp
receives contributions from output rows rp-2..rp; sliding per-row dk/dv
accumulators emit each padded row right after its last contribution,
with the two block-boundary rows riding a VMEM scratch carry into the
next grid step. drel accumulates across the grid like conv3x3's dW.
The s9 residual is (B, H+pad, 9C, W) in the input dtype — large at
scale 0 (~680 MB at the v9 flagship shape) but transient: the GRU scan
body is rematerialized, so it lives only inside one timestep's backward
segment.
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


def _roll_l(x, n):
    """Value at lane w of x[w + n] (left roll; wrap lanes are masked by
    construction: output columns past wl are dropped, and reads past the
    data region land in fill that only garbage output columns consume)."""
    if n == 0:
        return x
    return pltpu.roll(x, x.shape[-1] - n, 1)


def _roll_r(x, n, zero_first_n: bool = True):
    """Value at lane w of x[w - n], zeroing the first n lanes."""
    if n == 0:
        return x
    out = pltpu.roll(x, n, 1)
    if zero_first_n:
        col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        out = jnp.where(col < n, 0.0, out)
    return out


def _softmax_rows(q, krows, rel):
    """9 logits for one output row. q (C, W) f32; krows[0..2] padded rows
    (C, W) f32 (kp rows h..h+2); rel (9, C, 1) f32. Returns (logits list,
    k-tap list)."""
    logits, ktaps = [], []
    for i in range(9):
        kh, kw = i // 3, i % 3
        kt = _roll_l(krows[kh], kw) + rel[i]
        ktaps.append(kt)
        logits.append(q * kt)
    return logits, ktaps


def _attn_out(logits, vrows):
    """Streaming softmax + weighted value sum. Returns (out, e list, den,
    v-tap list)."""
    m = logits[0]
    for l in logits[1:]:
        m = jnp.maximum(m, l)
    es, vts, den, num = [], [], None, None
    for i in range(9):
        kh, kw = i // 3, i % 3
        e = jnp.exp(logits[i] - m)
        es.append(e)
        den = e if den is None else den + e
        vt = _roll_l(vrows[kh], kw)
        vts.append(vt)
        num = e * vt if num is None else num + e * vt
    return num / den, es, den, vts


def _fwd_kernel(wl, W, RB, RH, want_s, q_ref, k0, k1, v0, v1, rel_ref,
                out_ref, *s_ref):
    """Forward; with ``want_s`` also emits the 9 softmax weights (as a
    (RB, RH, 9C, W) block) so the backward can skip the logits/max/exp
    recompute — the backward is VPU-arithmetic-bound (fwd 1.4 ms vs bwd
    16 ms at 8x192x640x32 when it recomputes the softmax)."""
    rel = rel_ref[...].astype(jnp.float32)
    C = q_ref.shape[2]
    col = None
    for rb in range(RB):
        # padded row j of this block's halo band (j in [0, RH+1])
        def krow(j, a0=k0, a1=k1, _rb=rb):
            ref = a0 if j < RH else a1
            return ref[_rb, j % RH].astype(jnp.float32)

        for r in range(RH):
            q = q_ref[rb, r].astype(jnp.float32)
            krows = [krow(r + j) for j in range(3)]
            vrows = [krow(r + j, v0, v1) for j in range(3)]
            logits, _ = _softmax_rows(q, krows, rel)
            out, es, den, _ = _attn_out(logits, vrows)
            if want_s:
                inv = 1.0 / den
                for i in range(9):
                    s_ref[0][rb, r, i * C:(i + 1) * C] = (
                        es[i] * inv).astype(s_ref[0].dtype)
            if wl != W:
                if col is None:
                    col = lax.broadcasted_iota(jnp.int32, out.shape, 1)
                out = jnp.where(col < wl, out, 0.0)
            out_ref[rb, r] = out.astype(out_ref.dtype)


def _bwd_kernel(H, wl, W, RB, RH,
                q_ref, g_ref, kc_, kn_, vc_, vn_, s_ref, out_ref,
                rel_ref, dq_ref, dk_ref, dv_ref, drel_ref,
                ck_ref, cv_ref):
    """Backward from the SAVED softmax weights (s_ref) and output: no
    logits/max/exp recompute. Tap (kh, kw) of output row h = hb*RH + rr
    lands on padded row h + kh, i.e. local rows rr..rr+2 — rows RH, RH+1
    spill into the NEXT grid step's block and ride the VMEM scratch carry
    (the grid iterates row-blocks fastest, so the carry is hot when the
    next block reads it)."""
    hb = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, hb == 0))
    def _init():
        drel_ref[...] = jnp.zeros_like(drel_ref)

    @pl.when(hb == 0)
    def _reset_carry():
        ck_ref[...] = jnp.zeros_like(ck_ref)
        cv_ref[...] = jnp.zeros_like(cv_ref)

    rel = rel_ref[...].astype(jnp.float32)
    C = q_ref.shape[2]
    col = None
    for rb in range(RB):
        def krow(j, cur=kc_, nxt=kn_, _rb=rb):
            # padded row hb*RH + j, j in [0, RH+1]
            ref = cur if j < RH else nxt
            return ref[_rb, j % RH].astype(jnp.float32)

        zero = jnp.zeros(dk_ref.shape[2:], jnp.float32)
        # sliding dk/dv accumulators for padded rows rr, rr+1, rr+2: row
        # rr' > rr never touches padded row rr again, so it is emitted
        # right after its last contribution — keeps 6 accumulator tiles
        # live instead of 2*(RH+2)
        dk3 = [zero, zero, zero]
        dv3 = [zero, zero, zero]
        # per-window drel accumulated as full tiles across the block's
        # rows; ONE lane-reduction per window per program at the end
        # (lane reductions are cross-lane-unit serialized — doing them
        # per row costs 9*RH of them)
        drel9 = [zero] * 9
        for rr in range(RH):
            h = hb * RH + rr
            q = q_ref[rb, rr].astype(jnp.float32)
            g = g_ref[rb, rr].astype(jnp.float32)
            out = out_ref[rb, rr].astype(jnp.float32)
            if col is None:
                col = lax.broadcasted_iota(jnp.int32, q.shape, 1)
            if wl != W:
                g = jnp.where(col < wl, g, 0.0)
            # kill block-pad rows (h >= H) — their dq/dk/dv/drel are zero
            g = jnp.where(h <= H - 1, g, 0.0)
            krows = [krow(rr + j) for j in range(3)]
            vrows = [krow(rr + j, vc_, vn_) for j in range(3)]
            dq_row = zero
            for i in range(9):
                kh, kw = i // 3, i % 3
                s_i = s_ref[rb, rr, i * C:(i + 1) * C].astype(jnp.float32)
                u_i = s_i * g                                    # dv tap
                vt = _roll_l(vrows[kh], kw)
                dlog_i = u_i * (vt - out)                        # dlogit
                dq_row = dq_row + dlog_i * (_roll_l(krows[kh], kw) + rel[i])
                a_i = dlog_i * q
                drel9[i] = drel9[i] + a_i
                # tap (kh, kw) of output row h lands on padded local row
                # rr + kh, padded col w + kw
                dk3[kh] = dk3[kh] + _roll_r(a_i, kw)
                dv3[kh] = dv3[kh] + _roll_r(u_i, kw)
            dq_ref[rb, rr] = dq_row.astype(dq_ref.dtype)
            # padded row rr is final: emit and slide the window
            vk, vv = dk3[0], dv3[0]
            if rr < 2:
                vk = vk + ck_ref[rb, rr]
                vv = vv + cv_ref[rb, rr]
            dk_ref[rb, rr] = vk.astype(dk_ref.dtype)
            dv_ref[rb, rr] = vv.astype(dv_ref.dtype)
            dk3 = [dk3[1], dk3[2], zero]
            dv3 = [dv3[1], dv3[2], zero]
        for j in range(2):
            ck_ref[rb, j] = dk3[j]
            cv_ref[rb, j] = dv3[j]
        lane9 = lax.broadcasted_iota(jnp.int32, drel_ref.shape, 1)
        drel_new = jnp.zeros(drel_ref.shape, jnp.float32)
        for i in range(9):
            dr = jnp.sum(drel9[i], axis=1, keepdims=True)       # (C, 1)
            # scatter onto lane i of the (C, 9) accumulator tile
            # (lane-concat of 1-lane arrays is Mosaic-hostile)
            drel_new = drel_new + jnp.where(lane9 == i, dr, 0.0)
        drel_ref[...] += drel_new


def _block_plan(B, C, W, n_views):
    """(RB, RH) such that the double-buffered views + f32 temporaries fit
    scoped VMEM. Views are bf16/f32 row-blocks (RH, C, W); temps are
    ~30 (C, W) f32 tiles independent of RH."""
    # the hard scoped-vmem limit is 16M; the estimate below undercounts
    # Mosaic's actual stack by ~1.6x at big C*W (measured 16.42M for an
    # 8.5M estimate at C=256, W=128, RH=8) — keep generous headroom
    budget = 7 * 2**20
    for rb, rh in ((2, 8), (1, 8), (1, 4), (1, 2)):
        # ~30 live f32 row tiles: 9 logits, the 6 sliding dk/dv
        # accumulators + carry scratch, q/g/krows/vrows, misc
        temps = 30 * C * W * 4
        views = n_views * rb * rh * C * W * 2 * 2   # bf16, double-buffered
        if B % rb == 0 and views + temps < budget:
            return rb, rh
    return 1, 2   # the bwd carry needs RH >= 2


def _pad_rows(x, n):
    """Append n zero rows (axis 1)."""
    if n == 0:
        return x
    B, _, C, W = x.shape
    return jnp.concatenate([x, jnp.zeros((B, n, C, W), x.dtype)], axis=1)


def fits_attend3(H, C, W):
    """Static predicate: the kernel serves this shape (VMEM bound)."""
    Wp = -(-(W + 2) // 128) * 128
    return _PALLAS_OK and H >= 1 and W >= 2 and C * Wp * 4 * 40 < 12 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attend3_core(q, kp, vp, rel, wl, interpret):
    return _attend3_fwd_call(q, kp, vp, rel, wl, interpret)


def _attend3_fwd_call(q, kp, vp, rel, wl, interpret, want_s=False,
                      plan=None):
    B, H, C, W = q.shape
    RB, RH = plan or _block_plan(B, C, W, 6)
    # want_s pads the output grid to the bwd's padded-row grid so the
    # saved s/out feed the backward without a repack
    nh = -(-(H + 2) // RH) if want_s else -(-H // RH)
    qf = _pad_rows(q, nh * RH - H)
    # k/v blocks: block hb serves output rows [hb*RH, hb*RH+RH) reading
    # padded rows [hb*RH, hb*RH+RH+1] — block hb plus the first two rows
    # of block hb+1, so the arrays need (nh+1) blocks of rows
    kf = _pad_rows(kp, (nh + 1) * RH - (H + 2))
    vf = _pad_rows(vp, (nh + 1) * RH - (H + 2))
    blk = lambda d: (lambda b, h: (b, h + d, 0, 0))
    nkb = nh + 1
    nxt = lambda b, h: (b, jnp.minimum(h + 1, nkb - 1), 0, 0)
    out_specs = [pl.BlockSpec((RB, RH, C, W), blk(0))]
    out_shape = [jax.ShapeDtypeStruct((B, nh * RH, C, W), q.dtype)]
    if want_s:
        out_specs.append(pl.BlockSpec((RB, RH, 9 * C, W), blk(0)))
        out_shape.append(
            jax.ShapeDtypeStruct((B, nh * RH, 9 * C, W), q.dtype))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, wl, W, RB, RH, want_s),
        grid=(B // RB, nh),
        in_specs=[pl.BlockSpec((RB, RH, C, W), blk(0)),
                  pl.BlockSpec((RB, RH, C, W), blk(0)),
                  pl.BlockSpec((RB, RH, C, W), nxt),
                  pl.BlockSpec((RB, RH, C, W), blk(0)),
                  pl.BlockSpec((RB, RH, C, W), nxt),
                  pl.BlockSpec((9, C, 1), lambda b, h: (0, 0, 0))],
        out_specs=out_specs if want_s else out_specs[0],
        out_shape=out_shape if want_s else out_shape[0],
        interpret=interpret,
    )(qf, kf, kf, vf, vf, rel)
    if want_s:
        return res[0], res[1]           # padded rows; bwd consumes as-is
    return res[:, :H]


def _plan_s(B, C, W):
    """Shared block plan for the saved-softmax fwd/bwd pair (the s tile
    counts as 9 view-equivalents)."""
    return _block_plan(B, C, W, 16)


def _attend3_fwd(q, kp, vp, rel, wl, interpret):
    B, H, C, W = q.shape
    outp, s9 = _attend3_fwd_call(q, kp, vp, rel, wl, interpret,
                                 want_s=True, plan=_plan_s(B, C, W))
    return outp[:, :H], (q, kp, vp, rel, s9, outp)


def _attend3_bwd(wl, interpret, saved, g):
    q, kp, vp, rel, s9, outp = saved
    B, H, C, W = q.shape
    RB, RH = _plan_s(B, C, W)
    Hp = H + 2
    nh = -(-Hp // RH)                   # padded-row blocks (dk/dv coverage)
    rows = nh * RH
    assert s9.shape[1] == rows and outp.shape[1] == rows
    # q/g padded to the padded-row grid (their block ids coincide with the
    # dk/dv block ids — output row h's taps land on padded rows h..h+2);
    # k/v get one extra block for the +2 halo
    qf = _pad_rows(q, rows - H)
    gf = _pad_rows(g.astype(q.dtype), rows - H)
    kf = _pad_rows(kp, (nh + 1) * RH - Hp)
    vf = _pad_rows(vp, (nh + 1) * RH - Hp)

    cur = lambda b, h: (b, h, 0, 0)
    nxt = lambda b, h: (b, jnp.minimum(h + 1, nh), 0, 0)

    spec = lambda m: pl.BlockSpec((RB, RH, C, W), m)
    kinds = [jax.ShapeDtypeStruct((B, rows, C, W), q.dtype),   # dq (padded)
             jax.ShapeDtypeStruct((B, rows, C, W), kp.dtype),  # dk
             jax.ShapeDtypeStruct((B, rows, C, W), vp.dtype),  # dv
             jax.ShapeDtypeStruct((C, 9), jnp.float32)]        # drel acc
    dqp, dk, dv, drel = pl.pallas_call(
        functools.partial(_bwd_kernel, H, wl, W, RB, RH),
        grid=(B // RB, nh),
        in_specs=[spec(cur), spec(cur),
                  spec(cur), spec(nxt),
                  spec(cur), spec(nxt),
                  pl.BlockSpec((RB, RH, 9 * C, W), cur),
                  spec(cur),
                  pl.BlockSpec((9, C, 1), lambda b, h: (0, 0, 0))],
        out_specs=[spec(cur), spec(cur), spec(cur),
                   pl.BlockSpec((C, 9), lambda b, h: (0, 0))],
        out_shape=kinds,
        scratch_shapes=[pltpu.VMEM((RB, 2, C, W), jnp.float32),
                        pltpu.VMEM((RB, 2, C, W), jnp.float32)],
        interpret=interpret,
    )(qf, gf, kf, kf, vf, vf, s9, outp, rel)
    dq = dqp[:, :H]
    drel = jnp.transpose(drel, (1, 0))[:, :, None].astype(rel.dtype)  # (9,C,1)
    return dq.astype(q.dtype), dk[:, :Hp], dv[:, :Hp], drel


_attend3_core.defvjp(_attend3_fwd, _attend3_bwd)


def attend3(q, kp, vp, rel, interpret: bool = False):
    """Fused 3x3 windowed per-channel attention, planar layout.

    q   (B, H, C, W)      query map (planar)
    kp  (B, H+2, C, W+2)  key map, +1 padded ring (carrying the key-conv
                          bias, or zeros when use_bias=False)
    vp  (B, H+2, C, W+2)  value map, padded likewise
    rel (9, C)            relative positional embedding per window slot
                          (row-major kh*3+kw), added to the key taps

    Returns (B, H, C, W). Gradients flow to all four operands; the ring
    cotangent of kp/vp reaches the bias through the caller's pad op.
    """
    B, H, C, W = q.shape
    assert kp.shape == (B, H + 2, C, W + 2) and vp.shape == kp.shape, (
        q.shape, kp.shape, vp.shape)
    Wp = -(-(W + 2) // 128) * 128
    fill = Wp - (W + 2)
    qf = jnp.concatenate(
        [q, jnp.zeros((B, H, C, Wp - W), q.dtype)], axis=3)
    kf = jnp.concatenate(
        [kp, jnp.zeros((B, H + 2, C, fill), kp.dtype)], axis=3) \
        if fill else kp
    vf = jnp.concatenate(
        [vp, jnp.zeros((B, H + 2, C, fill), vp.dtype)], axis=3) \
        if fill else vp
    rel3 = rel.astype(jnp.float32)[:, :, None]                    # (9, C, 1)
    out = _attend3_core(qf, kf, vf, rel3, W, interpret)
    return out[..., :W]
