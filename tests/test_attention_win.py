"""Parity tests for the fused Pallas 3x3 windowed-attention kernel.

ops/pallas/attention_win.attend3 replaces the streaming-softmax attend()
chain inside AttentionConv (reference networks/attention.py:9-61, invoked
k=3 by every GRU fusion block, rnn.py:578-583). These tests pin the raw
kernel to a dense jnp reference (fwd + grads to q/k/v/rel, interpret
mode), and the full AttentionConv module with the kernel path on vs off
(bias ring, rel tables, both shared_rel variants).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.ops.pallas.attention_win import attend3


def _ref_attend(q, kp, vp, rel):
    """Dense jnp reference on planar tensors (f32)."""
    B, H, C, W = q.shape
    logits = []
    vals = []
    for i in range(9):
        kh, kw = i // 3, i % 3
        k_i = kp[:, kh:kh + H, :, kw:kw + W] + rel[i][None, None, :, None]
        logits.append(q * k_i)
        vals.append(vp[:, kh:kh + H, :, kw:kw + W])
    logits = jnp.stack(logits, 0)
    attn = jax.nn.softmax(logits, axis=0)
    return jnp.sum(attn * jnp.stack(vals, 0), axis=0)


CASES = [
    # (B, H, C, W) — W=126 makes the padded width exactly 128; W=40/200
    # exercise the fill path
    (2, 6, 8, 126),
    (1, 5, 16, 40),
    pytest.param(2, 9, 4, 200, marks=pytest.mark.slow),
    pytest.param(1, 1, 8, 126, marks=pytest.mark.slow),   # single row
]


@pytest.mark.parametrize("B,H,C,W", CASES)
def test_attend3_fwd_and_grads(rng, B, H, C, W):
    q = jnp.asarray(rng.randn(B, H, C, W).astype(np.float32))
    kp = jnp.asarray(rng.randn(B, H + 2, C, W + 2).astype(np.float32))
    vp = jnp.asarray(rng.randn(B, H + 2, C, W + 2).astype(np.float32))
    rel = jnp.asarray(rng.randn(9, C).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.randn(B, H, C, W).astype(np.float32))

    o_ref = _ref_attend(q, kp, vp, rel)
    o_pal = attend3(q, kp, vp, rel, interpret=True)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)

    def loss_ref(a):
        return jnp.sum(_ref_attend(*a) * g)

    def loss_pal(a):
        return jnp.sum(attend3(*a, interpret=True) * g)

    g_ref = jax.grad(loss_ref)((q, kp, vp, rel))
    g_pal = jax.grad(loss_pal)((q, kp, vp, rel))
    for name, a, b in zip(("dq", "dk", "dv", "drel"), g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("shared_rel,use_bias", [(False, True), (True, True),
                                                 (False, False)])
def test_attention_conv_kernel_path(rng, monkeypatch, shared_rel, use_bias):
    """AttentionConv module: kernel path == streaming jnp path."""
    from ssde_tpu.models.attention import AttentionConv

    B, H, W, C = 2, 6, 30, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    mod = AttentionConv(C, 3, use_bias=use_bias, shared_rel=shared_rel)

    monkeypatch.setenv("SSDE_ATTN_KERNEL", "0")
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    o_ref = mod.apply({"params": params}, x)

    def loss(p, xx):
        return jnp.sum(mod.apply({"params": p}, xx) ** 2)

    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setenv("SSDE_ATTN_KERNEL", "1")
    monkeypatch.setenv("SSDE_CONV_INTERPRET", "1")
    o_pal = mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)
    gp_pal, gx_pal = jax.grad(loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat_pal = dict(jax.tree_util.tree_leaves_with_path(gp_pal))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pal[path]), np.asarray(leaf),
            rtol=2e-4, atol=2e-4, err_msg=str(path))
