"""Local windowed self-attention ("stand-alone self-attention") in Flax, NHWC.

TPU-first re-design of the reference's AttentionConv (canonical copy:
networks/attention.py:9-61; five near-duplicates elsewhere are unified here
behind flags). Instead of PyTorch ``unfold`` (which materializes k^2 copies
in a strided view), the k x k neighbourhood is gathered as k^2 shifted
slices stacked on a window axis — a layout XLA turns into cheap dynamic
slices that fuse with the softmax/weighted-sum epilogue.

Semantics notes (verified against the reference):
  * attention logits are **per-channel** (q * k elementwise), softmax over
    the k^2 window axis; ``groups`` only affects parameter bookkeeping, not
    the math (reference attention.py:43-50).
  * the key window gets relative positional embeddings: the first C/2
    channels get rel_h (varies along window row), the last C/2 get rel_w
    (varies along window column) (attention.py:40-41).
  * the fusion-family variant uses scalar (channel-shared) rel embeddings
    (fusion_v2.py:57-58) — ``shared_rel=True``.
  * 1x1 convs are applied to the *zero-padded* input; with bias=True the
    pad ring therefore carries the bias value, which matters for border
    pixels — we pad first, conv second, exactly like the reference.
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import _ConvParams

_kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _attn_kernel_enabled():
    """Fused Pallas windowed-attention path: on by default on TPU,
    interpret-mode when SSDE_CONV_INTERPRET is set (CPU tests), opt-out
    via SSDE_ATTN_KERNEL=0."""
    v = os.environ.get("SSDE_ATTN_KERNEL")
    if v is not None:
        return v not in ("0", "false")
    if os.environ.get("SSDE_CONV_INTERPRET"):
        return True
    return jax.default_backend() not in ("cpu",)


_ATTN_REMAT = [False]


class remat_attention:
    """Trace-time context: rematerialize each fused-attention call.

    The saved-softmax kernel (ops/pallas/attention_win) emits a
    (RB, RH, 9C, W) softmax residual — 686 MB per call at 8x192x640x32 —
    which is what forces the GRU sequence step to remat its WHOLE scan
    body (steps_gru._remat_mode). Inside this context the q/k/v matmuls +
    kernel call are wrapped in ``jax.checkpoint``: the residual becomes
    transient (recomputed in backward at ~1 extra kernel-forward per
    call) while everything ELSE the scan body produces stays saved. Used
    by steps_gru around the attention-version unroll so v9 can skip the
    scan-body remat like v10 does.
    """

    def __enter__(self):
        _ATTN_REMAT.append(True)
        return self

    def __exit__(self, *exc):
        _ATTN_REMAT.pop()
        return False


def _attn_remat_active():
    return _ATTN_REMAT[-1] or os.environ.get("SSDE_REMAT_ATTN") == "1"


def _pad_ring(xpl, b):
    """Planar (B, H, C, W) -> (B, H+2, C, W+2) with the ring holding the
    per-channel value ``b`` (the conv bias: the reference zero-pads the
    input BEFORE its biased 1x1 convs, so the pad ring carries the bias)."""
    B, H, C, W = xpl.shape
    bc = b.astype(xpl.dtype)
    col = jnp.broadcast_to(bc[None, None, :, None], (B, H, C, 1))
    x2 = jnp.concatenate([col, xpl, col], axis=3)
    row = jnp.broadcast_to(bc[None, None, :, None], (B, 1, C, W + 2))
    return jnp.concatenate([row, x2, row], axis=1)


def extract_windows(x, kernel_size: int):
    """(B, H+k-1, W+k-1, C) padded input -> (B, H, W, k*k, C) windows.

    Window axis is flattened row-major (kh * k + kw), matching torch
    unfold(2).unfold(3) + view ordering.
    """
    k = kernel_size
    B, Hp, Wp, C = x.shape
    H, W = Hp - (k - 1), Wp - (k - 1)
    slices = [
        x[:, dh : dh + H, dw : dw + W, :]
        for dh in range(k)
        for dw in range(k)
    ]
    return jnp.stack(slices, axis=3)


class AttentionConv(nn.Module):
    out_channels: int
    kernel_size: int
    groups: int = 1
    use_bias: bool = False
    shared_rel: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, planar: bool = False, wl: int = 0):
        """``planar=True`` takes/returns chain-padded planar (B, H, C, W)
        tensors with logical width ``wl`` (zero fill past wl) and runs the
        whole call in planar layout — the q/k/v 1x1 convs become planar
        einsums feeding the fused kernel directly, so no NHWC<->planar
        relayouts materialize at the pallas_call boundaries (measured
        ~12 ms of the 16.7 ms module cost at 8x192x640x32: XLA fuses
        transposes into elementwise consumers but must materialize them
        at custom-call operands/results)."""
        k = self.kernel_size
        C = self.out_channels
        pad = (k - 1) // 2
        Cin = x.shape[2] if planar else x.shape[-1]

        # nn.Conv-layout params (1, 1, Cin, C) so checkpoints/converters
        # are unchanged; the conv itself is x @ w[0,0] + b in either layout
        wq, bq = _ConvParams((1, 1, Cin, C), self.use_bias,
                             kernel_init=_kaiming_out, name="query_conv")()
        wk, bk = _ConvParams((1, 1, Cin, C), self.use_bias,
                             kernel_init=_kaiming_out, name="key_conv")()
        wv, bv = _ConvParams((1, 1, Cin, C), self.use_bias,
                             kernel_init=_kaiming_out, name="value_conv")()
        dt = self.dtype or x.dtype
        wq, wk, wv = (w[0, 0].astype(dt) for w in (wq, wk, wv))
        zb = jnp.zeros((C,), dt)
        bq, bk, bv = (zb if b is None else b.astype(dt)
                      for b in (bq, bk, bv))
        xc = x.astype(dt)
        rel = self._rel_table(k, C)

        from ..ops.pallas.attention_win import fits_attend3

        if planar:
            wl = wl or x.shape[3]
            if (k == 3 and _attn_kernel_enabled()
                    and fits_attend3(x.shape[1], C, wl)):
                return self._planar_kernel(xc, wl, wq, bq, wk, bk, wv, bv,
                                           rel)
            # CPU/no-kernel fallback: run the streaming path on the
            # logical columns, back in NHWC
            out = self._streaming(xc[..., :wl].transpose(0, 1, 3, 2),
                                  wq, bq, wk, bk, wv, bv, rel)
            out = out.transpose(0, 1, 3, 2)
            if out.shape[3] < x.shape[3]:
                out = jnp.pad(out, ((0, 0),) * 3
                              + ((0, x.shape[3] - out.shape[3]),))
            return out

        Hx, Wx = x.shape[1], x.shape[2]
        if k == 3 and _attn_kernel_enabled() and fits_attend3(Hx, C, Wx):
            return self._kernel_path(xc, wq, bq, wk, bk, wv, bv, rel)
        return self._streaming(xc, wq, bq, wk, bk, wv, bv, rel)

    def _streaming(self, xc, wq, bq, wk, bk, wv, bv, rel):
        k = self.kernel_size
        pad = (k - 1) // 2
        q = xc @ wq + bq
        xp = jnp.pad(xc, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        # 1x1 convs applied to the zero-padded input: the pad ring
        # carries the bias, exactly like the reference
        key = xp @ wk + bk
        val = xp @ wv + bv

        # streaming softmax over the k^2 window WITHOUT materializing a
        # (B, H, W, k2, C) window tensor: with the small channel counts of
        # the fusion blocks the (k2, C) trailing tile is mostly padding
        # (14% utilization at C=32) and the windowed tensors cost GBs of
        # HBM per step. The chain runs in planar (B, C, H, W) so XLA's
        # (8, 128) tiles land on full (H, W) dims instead of padding C
        # 4x, and is rematerialized in backward (checkpoint) so autodiff
        # saves only q/key/val, not the k^2 logit tensors.
        B, H, W, _ = q.shape
        rel = rel.astype(q.dtype)              # (k2, C)

        @jax.checkpoint
        def attend(qp, kp, vp):
            # planar: qp (B, C, H, W); kp/vp padded (B, C, H+2p, W+2p)
            logits = []
            for i in range(k * k):
                dh, dw = i // k, i % k
                r_i = rel[i][None, :, None, None]
                k_i = kp[:, :, dh:dh + H, dw:dw + W] + r_i
                logits.append(qp * k_i)
            m = logits[0]
            for l in logits[1:]:
                m = jnp.maximum(m, l)
            num = jnp.zeros_like(qp)
            den = jnp.zeros_like(qp)
            for i in range(k * k):
                dh, dw = i // k, i % k
                e = jnp.exp(logits[i] - m)
                den = den + e
                num = num + e * vp[:, :, dh:dh + H, dw:dw + W]
            return num / den

        out = attend(q.transpose(0, 3, 1, 2), key.transpose(0, 3, 1, 2),
                     val.transpose(0, 3, 1, 2))
        return out.transpose(0, 2, 3, 1)

    def _rel_table(self, k, C):
        if self.shared_rel:
            rel_h = self.param("rel_h", nn.initializers.normal(1.0), (k,))
            rel_w = self.param("rel_w", nn.initializers.normal(1.0), (k,))
            # first half channels + rel_h[kh], second half + rel_w[kw]
            rh = jnp.repeat(rel_h, k)                      # (k2,) varies by row
            rw = jnp.tile(rel_w, k)                        # (k2,) varies by col
            return jnp.concatenate(
                [
                    jnp.broadcast_to(rh[:, None], (k * k, C // 2)),
                    jnp.broadcast_to(rw[:, None], (k * k, C - C // 2)),
                ],
                axis=-1,
            )
        rel_h = self.param("rel_h", nn.initializers.normal(1.0), (C // 2, k))
        rel_w = self.param("rel_w", nn.initializers.normal(1.0), (C // 2, k))
        rh = jnp.repeat(rel_h, k, axis=1)                  # (C/2, k2) by row
        rw = jnp.tile(rel_w, (1, k))                       # (C/2, k2) by col
        return jnp.concatenate([rh, rw], axis=0).T         # (k2, C)

    def _kernel_path(self, x, wq, bq, wk, bk, wv, bv, rel):
        """Fused Pallas path, NHWC in/out: 1x1 convs on the UNPADDED input
        (identical params), bias carried on the pad ring (see _pad_ring),
        one fused windowed-softmax kernel in planar layout."""
        from ..ops.pallas.attention_win import attend3

        def run(x, wq, bq, wk, bk, wv, bv, rel):
            q = x @ wq + bq
            key = x @ wk + bk
            val = x @ wv + bv
            qp = q.transpose(0, 1, 3, 2)                   # (B, H, C, W)
            kp = _pad_ring(key.transpose(0, 1, 3, 2), bk)
            vp = _pad_ring(val.transpose(0, 1, 3, 2), bv)
            out = attend3(qp, kp, vp, rel,
                          interpret=bool(os.environ.get("SSDE_CONV_INTERPRET")))
            return out.transpose(0, 1, 3, 2)

        if _attn_remat_active():
            run = jax.checkpoint(run)
        return run(x, wq, bq, wk, bk, wv, bv, rel)

    def _planar_kernel(self, x, wl, wq, bq, wk, bk, wv, bv, rel):
        """Fused Pallas path, chain-padded planar in/out: the 1x1 convs
        run as planar matmuls (einsum over the C dim, W on lanes) so the
        kernel's operands are produced in their native layout — no
        NHWC<->planar relayouts materialize anywhere."""
        from ..ops.pallas.attention_win import attend3

        wp = x.shape[3]

        def run(x, wq, bq, wk, bk, wv, bv, rel):
            xl = x[..., :wl] if wl < wp else x

            def mm(w, b):
                return jnp.einsum("dc,bhcw->bhdw", w.T, xl) + b[:, None]

            q, key, val = mm(wq, bq), mm(wk, bk), mm(wv, bv)
            kp = _pad_ring(key, bk)
            vp = _pad_ring(val, bv)
            out = attend3(q, kp, vp, rel,
                          interpret=bool(os.environ.get("SSDE_CONV_INTERPRET")))
            if wl < wp:
                out = jnp.pad(out, ((0, 0),) * 3 + ((0, wp - wl),))
            return out

        if _attn_remat_active():
            run = jax.checkpoint(run)
        return run(x, wq, bq, wk, bk, wv, bv, rel)


class AttentionStem(nn.Module):
    """Multi-value-projection attention stem (reference attention.py:63-127).

    Not used by any reference trainer but part of the public model zoo.
    """

    out_channels: int
    kernel_size: int
    groups: int = 1
    m: int = 4
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        C = self.out_channels
        pad = (k - 1) // 2
        cg = C // self.groups

        q = nn.Conv(C, (1, 1), use_bias=self.use_bias, kernel_init=_kaiming_out,
                    dtype=self.dtype, name="query_conv")(x)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        key = nn.Conv(C, (1, 1), use_bias=self.use_bias, kernel_init=_kaiming_out,
                      dtype=self.dtype, name="key_conv")(xp)
        vals = [
            nn.Conv(C, (1, 1), use_bias=self.use_bias, kernel_init=_kaiming_out,
                    dtype=self.dtype, name=f"value_conv_{i}")(xp)
            for i in range(self.m)
        ]

        emb_a = self.param("emb_a", nn.initializers.normal(1.0), (cg, k))
        emb_b = self.param("emb_b", nn.initializers.normal(1.0), (cg, k))
        emb_mix = self.param("emb_mix", nn.initializers.normal(1.0), (self.m, cg))

        logit_a = emb_mix @ emb_a                          # (m, k)
        logit_b = emb_mix @ emb_b                          # (m, k)
        emb = logit_a[:, :, None] + logit_b[:, None, :]    # (m, k, k)
        emb = nn.softmax(emb.reshape(self.m, -1), axis=0)  # softmax over m
        emb = emb.reshape(self.m, k * k)                   # (m, k2)

        kw = extract_windows(key, k)                       # (B, H, W, k2, C)
        vws = jnp.stack([extract_windows(v, k) for v in vals], axis=0)  # (m,B,H,W,k2,C)
        vw = jnp.sum(emb[:, None, None, None, :, None].astype(vws.dtype) * vws, axis=0)

        logits = q[:, :, :, None, :] * kw
        attn = nn.softmax(logits, axis=3)
        return jnp.sum(attn * vw, axis=3)


class ResidualAttentionUnit(nn.Module):
    """relu-atten-relu-atten + skip (reference fusion_v2.py:105-137).

    The fusion_v2 blocks construct AttentionConv with bias=True and scalar
    (channel-shared) rel embeddings (fusion_v2.py:115-121); the rnn.py copy
    uses per-channel rel embeddings with kernel hard-coded to 3
    (rnn.py:578,582-583) — select with ``shared_rel``.
    """

    features: int
    shared_rel: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, planar: bool = False, wl: int = 0):
        # the reference's nn.ReLU(inplace=True) mutates its input, so the
        # residual connection actually adds relu(x), NOT x
        # (fusion_v2.py:127-137, rnn.py:650-662) — reproduced deliberately
        # for checkpoint parity (verified in tests/test_torch_parity.py)
        r = nn.relu(x)
        out = AttentionConv(self.features, 3, use_bias=True,
                            shared_rel=self.shared_rel,
                            dtype=self.dtype, name="atten1")(
            r, planar=planar, wl=wl)
        out = nn.relu(out)
        out = AttentionConv(self.features, 3, use_bias=True,
                            shared_rel=self.shared_rel,
                            dtype=self.dtype, name="atten2")(
            out, planar=planar, wl=wl)
        return out + r
