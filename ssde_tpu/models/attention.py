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
    def __call__(self, x):
        k = self.kernel_size
        C = self.out_channels
        pad = (k - 1) // 2

        query_conv = nn.Conv(C, (1, 1), use_bias=self.use_bias,
                             kernel_init=_kaiming_out, dtype=self.dtype,
                             name="query_conv")
        key_conv = nn.Conv(C, (1, 1), use_bias=self.use_bias,
                           kernel_init=_kaiming_out, dtype=self.dtype,
                           name="key_conv")
        value_conv = nn.Conv(C, (1, 1), use_bias=self.use_bias,
                             kernel_init=_kaiming_out, dtype=self.dtype,
                             name="value_conv")

        from ..ops.pallas.attention_win import attend3, fits_attend3

        Bx, Hx, Wx, Cin = x.shape
        if k == 3 and _attn_kernel_enabled() and fits_attend3(Hx, C, Wx):
            return self._kernel_path(x, query_conv, key_conv, value_conv)

        q = query_conv(x)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        key = key_conv(xp)
        val = value_conv(xp)

        rel = self._rel_table(k, C)

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

    def _kernel_path(self, x, query_conv, key_conv, value_conv):
        """Fused Pallas path: 1x1 convs on the UNPADDED input (identical
        params), bias carried on the pad ring (see _pad_ring), one fused
        windowed-softmax kernel in planar layout."""
        from ..ops.pallas.attention_win import attend3

        C = self.out_channels
        Cin = x.shape[-1]
        q = query_conv(x)
        key = key_conv(x)
        val = value_conv(x)
        if self.use_bias:
            zero = jnp.zeros((1, 1, 1, Cin), x.dtype)
            bk = key_conv(zero)[0, 0, 0]
            bv = value_conv(zero)[0, 0, 0]
        else:
            bk = bv = jnp.zeros((C,), x.dtype)
        rel = self._rel_table(3, C)
        qp = q.transpose(0, 1, 3, 2)                       # (B, H, C, W)
        kp = _pad_ring(key.transpose(0, 1, 3, 2), bk)
        vp = _pad_ring(val.transpose(0, 1, 3, 2), bv)
        out = attend3(qp, kp, vp, rel,
                      interpret=bool(os.environ.get("SSDE_CONV_INTERPRET")))
        return out.transpose(0, 1, 3, 2)


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
    def __call__(self, x):
        # the reference's nn.ReLU(inplace=True) mutates its input, so the
        # residual connection actually adds relu(x), NOT x
        # (fusion_v2.py:127-137, rnn.py:650-662) — reproduced deliberately
        # for checkpoint parity (verified in tests/test_torch_parity.py)
        r = nn.relu(x)
        out = AttentionConv(self.features, 3, use_bias=True,
                            shared_rel=self.shared_rel,
                            dtype=self.dtype, name="atten1")(r)
        out = nn.relu(out)
        out = AttentionConv(self.features, 3, use_bias=True,
                            shared_rel=self.shared_rel,
                            dtype=self.dtype, name="atten2")(out)
        return out + r
