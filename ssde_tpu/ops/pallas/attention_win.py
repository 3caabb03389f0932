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
This kernel holds one row's window in VMEM: q, k, v are each read from
HBM exactly once forward (q, k, v, g once + dq, dk, dv written once
backward), with all 9 taps materialized as lane-rolls of the row band.

Layout contract (same as ops/pallas/conv3x3): planar ``(B, H, C, W)`` —
W on lanes, C on sublanes. k/v arrive PADDED to (B, H+2, C, W+2) with
the +1 ring carrying the key/value conv bias (the reference pads x with
zeros *before* the 1x1 convs, so the ring value IS the bias; we pad the
conv output with the bias value, which is identical and keeps the ring's
cotangent flowing back to the bias parameter through the pad's autodiff).
All widths are chain-padded to a 128 multiple; ``wl`` is the logical
output width (fill columns stay zero).

Backward is a custom VJP: output row h's window reads padded rows
h..h+2, so padded row rp receives contributions from output rows
rp-2..rp; the backward kernel recomputes the (cheap, VMEM-resident)
softmax for those three rows from a 5-row halo and assembles dq, dk, dv
in one pass. drel accumulates across the grid like conv3x3's dW.
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
    """Streaming softmax + weighted value sum. Returns (out, e list, den)."""
    m = logits[0]
    for l in logits[1:]:
        m = jnp.maximum(m, l)
    es, den, num = [], None, None
    for i in range(9):
        kh, kw = i // 3, i % 3
        e = jnp.exp(logits[i] - m)
        es.append(e)
        den = e if den is None else den + e
        vt = _roll_l(vrows[kh], kw)
        num = e * vt if num is None else num + e * vt
    return num / den, es, den


def _fwd_kernel(wl, W, RB, q_ref, k0, k1, k2, v0, v1, v2, rel_ref, out_ref):
    rel = rel_ref[...].astype(jnp.float32)
    for r in range(RB):
        q = q_ref[r, 0].astype(jnp.float32)
        krows = [k0[r, 0].astype(jnp.float32), k1[r, 0].astype(jnp.float32),
                 k2[r, 0].astype(jnp.float32)]
        vrows = [v0[r, 0].astype(jnp.float32), v1[r, 0].astype(jnp.float32),
                 v2[r, 0].astype(jnp.float32)]
        logits, _ = _softmax_rows(q, krows, rel)
        out, _, _ = _attn_out(logits, vrows)
        if wl != W:
            col = lax.broadcasted_iota(jnp.int32, out.shape, 1)
            out = jnp.where(col < wl, out, 0.0)
        out_ref[r, 0] = out.astype(out_ref.dtype)


def _bwd_kernel(H, wl, W, RB,
                qm2, qm1, qm0, gm2, gm1, gm0,
                km2, km1, k0, kp1, kp2, vm2, vm1, v0, vp1, vp2,
                rel_ref, dq_ref, dk_ref, dv_ref, drel_ref):
    rp = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, rp == 0))
    def _init():
        drel_ref[...] = jnp.zeros_like(drel_ref)

    rel = rel_ref[...].astype(jnp.float32)
    col = None
    for r in range(RB):
        qs = [qm2[r, 0], qm1[r, 0], qm0[r, 0]]
        gs = [gm2[r, 0], gm1[r, 0], gm0[r, 0]]
        ks = [km2[r, 0], km1[r, 0], k0[r, 0], kp1[r, 0], kp2[r, 0]]
        vs = [vm2[r, 0], vm1[r, 0], v0[r, 0], vp1[r, 0], vp2[r, 0]]
        dk_acc = jnp.zeros(dk_ref.shape[2:], jnp.float32)
        dv_acc = jnp.zeros_like(dk_acc)
        dq_row = jnp.zeros_like(dk_acc)
        drel_new = jnp.zeros(drel_ref.shape, jnp.float32)
        lane9 = lax.broadcasted_iota(jnp.int32, drel_ref.shape, 1)
        # output rows contributing to padded row rp: h = rp - kh
        for t in (2, 1, 0):          # h = rp - 2 + (2 - t)... iterate h
            h = rp - t               # t = rp - h = the kh that hits row rp
            q = qs[2 - t].astype(jnp.float32)
            g = gs[2 - t].astype(jnp.float32)
            if col is None:
                col = lax.broadcasted_iota(jnp.int32, q.shape, 1)
            if wl != W:
                g = jnp.where(col < wl, g, 0.0)
            # zero all of row h's contributions when h is not a real
            # output row (ring rows rp<2 / rp>H+... and the dq pad rows)
            h_ok = jnp.logical_and(h >= 0, h <= H - 1)
            g = jnp.where(h_ok, g, 0.0)
            # kp rows h..h+2 live at ks[(h - (rp - 2)) + j] = ks[2 - t + j]
            krows = [ks[2 - t + j].astype(jnp.float32) for j in range(3)]
            vrows = [vs[2 - t + j].astype(jnp.float32) for j in range(3)]
            logits, ktaps = _softmax_rows(q, krows, rel)
            out, es, den = _attn_out(logits, vrows)
            inv = 1.0 / den
            for i in range(9):
                kh, kw = i // 3, i % 3
                s_i = es[i] * inv
                u_i = s_i * g                                  # dv tap
                vt = _roll_l(vrows[kh], kw)
                dlog_i = u_i * (vt - out)                      # dlogit
                a_i = dlog_i * q                               # dk tap
                if t == 0:
                    dq_row = dq_row + dlog_i * ktaps[i]
                    dr = jnp.sum(dlog_i * q, axis=1, keepdims=True)  # (C,1)
                    # scatter onto lane i of the (C, 9) accumulator tile
                    # (lane-concat of 1-lane arrays is Mosaic-hostile)
                    drel_new = drel_new + jnp.where(lane9 == i, dr, 0.0)
                if kh == t:
                    # tap (kh, kw) of output row h lands on padded row
                    # h + kh == rp, padded col w + kw
                    dk_acc = dk_acc + _roll_r(a_i, kw)
                    dv_acc = dv_acc + _roll_r(u_i, kw)
        dk_ref[r, 0] = dk_acc.astype(dk_ref.dtype)
        dv_ref[r, 0] = dv_acc.astype(dv_ref.dtype)
        dq_ref[r, 0] = dq_row.astype(dq_ref.dtype)
        drel_ref[...] += drel_new


def _rb(B, C, W, n_bufs):
    budget = 10 * 2**20
    per_item = n_bufs * C * W * 4
    for rb in (8, 4, 2):
        if B % rb == 0 and rb * per_item < budget:
            return rb
    return 1


def fits_attend3(H, C, W):
    """Static predicate: the kernel serves this shape (VMEM bound)."""
    Wp = -(-(W + 2) // 128) * 128
    return _PALLAS_OK and H >= 1 and W >= 2 and C * Wp * 4 * 40 < 12 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attend3_core(q, kp, vp, rel, wl, interpret):
    return _attend3_fwd_call(q, kp, vp, rel, wl, interpret)


def _attend3_fwd_call(q, kp, vp, rel, wl, interpret):
    B, H, C, W = q.shape
    RB = _rb(B, C, W, 30)
    row = lambda d: (lambda b, h: (b, h + d, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, wl, W, RB),
        grid=(B // RB, H),
        in_specs=[pl.BlockSpec((RB, 1, C, W), row(0))] +
                 [pl.BlockSpec((RB, 1, C, W), row(d)) for d in (0, 1, 2)] +
                 [pl.BlockSpec((RB, 1, C, W), row(d)) for d in (0, 1, 2)] +
                 [pl.BlockSpec((9, C, 1), lambda b, h: (0, 0, 0))],
        out_specs=pl.BlockSpec((RB, 1, C, W), row(0)),
        out_shape=jax.ShapeDtypeStruct((B, H, C, W), q.dtype),
        interpret=interpret,
    )(q, kp, kp, kp, vp, vp, vp, rel)


def _attend3_fwd(q, kp, vp, rel, wl, interpret):
    out = _attend3_core(q, kp, vp, rel, wl, interpret)
    return out, (q, kp, vp, rel)


def _attend3_bwd(wl, interpret, saved, g):
    q, kp, vp, rel = saved
    B, H, C, W = q.shape
    Hp = H + 2
    RB = _rb(B, C, W, 60)
    # pad q/g to Hp rows so every ref indexes with the same padded row id
    zrow = jnp.zeros((B, 2, C, W), q.dtype)
    qp2 = jnp.concatenate([q, zrow], axis=1)
    gp2 = jnp.concatenate([g.astype(q.dtype), zrow], axis=1)

    def rowc(d):
        # padded-row view rp + d, clamped into [0, Hp)
        return lambda b, h: (b, jnp.clip(h + d, 0, Hp - 1), 0, 0)

    kinds = [jax.ShapeDtypeStruct((B, Hp, C, W), q.dtype),   # dq (padded H)
             jax.ShapeDtypeStruct((B, Hp, C, W), kp.dtype),  # dk
             jax.ShapeDtypeStruct((B, Hp, C, W), vp.dtype),  # dv
             jax.ShapeDtypeStruct((C, 9), jnp.float32)]      # drel acc
    dqp, dk, dv, drel = pl.pallas_call(
        functools.partial(_bwd_kernel, H, wl, W, RB),
        grid=(B // RB, Hp),
        in_specs=[pl.BlockSpec((RB, 1, C, W), rowc(d))
                  for d in (-2, -1, 0)] * 2 +
                 [pl.BlockSpec((RB, 1, C, W), rowc(d))
                  for d in (-2, -1, 0, 1, 2)] * 2 +
                 [pl.BlockSpec((9, C, 1), lambda b, h: (0, 0, 0))],
        out_specs=[pl.BlockSpec((RB, 1, C, W), rowc(0)),
                   pl.BlockSpec((RB, 1, C, W), rowc(0)),
                   pl.BlockSpec((RB, 1, C, W), rowc(0)),
                   pl.BlockSpec((C, 9), lambda b, h: (0, 0))],
        out_shape=kinds,
        interpret=interpret,
    )(qp2, qp2, qp2, gp2, gp2, gp2, kp, kp, kp, kp, kp,
      vp, vp, vp, vp, vp, rel)
    dq = dqp[:, :H]
    drel = jnp.transpose(drel, (1, 0))[:, :, None].astype(rel.dtype)  # (9,C,1)
    return dq.astype(q.dtype), dk, dv, drel


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
