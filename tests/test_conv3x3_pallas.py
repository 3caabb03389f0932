"""Parity tests for the fused planar Pallas 3x3 conv (+act) kernel.

The kernel (ops/pallas/conv3x3.py) runs the depth decoder's reflect-pad
convs in planar (B, H, C, W) layout with a hand-derived custom VJP; these
tests pin it to conv3x3_reflect_same (itself golden-tested against torch
in test_models.py) in interpret mode, and pin the whole planar DepthDecoder
path to the NHWC path. Reference op: layers.py:121-136 (Conv3x3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.models.common import conv3x3_reflect_same
from ssde_tpu.ops.pallas.conv3x3 import conv3x3, fits_conv3x3

CASES = [
    # (B, H, C, W, Cout, act) — W=131/96 exercise the lane-pad path.
    # Interpret-mode pallas is slow on 1-core CI hosts: two cases stay in
    # the fast tier, the rest (larger W / min-H edge) run in the slow tier.
    (2, 6, 8, 128, 16, "none"),
    (1, 5, 4, 131, 8, "elu"),
    pytest.param(2, 8, 16, 96, 1, "sigmoid", marks=pytest.mark.slow),
    pytest.param(2, 6, 8, 128, 8, "tanh", marks=pytest.mark.slow),
    pytest.param(1, 2, 8, 256, 8, "elu",
                 marks=pytest.mark.slow),  # minimum legal H
]


def _ref(x, w, b, act):
    out = conv3x3_reflect_same(jnp.transpose(x, (0, 1, 3, 2)), w, b)
    if act == "elu":
        out = jax.nn.elu(out)
    elif act == "sigmoid":
        out = jax.nn.sigmoid(out)
    elif act == "tanh":
        out = jnp.tanh(out)
    return jnp.transpose(out, (0, 1, 3, 2))


@pytest.mark.parametrize("B,H,C,W,Cout,act", CASES)
def test_conv3x3_fwd_and_grads(rng, B, H, C, W, Cout, act):
    x = jnp.asarray(rng.randn(B, H, C, W).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(B, H, Cout, W).astype(np.float32))

    o_ref = _ref(x, w, b, act)
    o_pal = conv3x3(x, w, b, act, interpret=True)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               atol=5e-6, rtol=1e-5)

    g_ref = jax.grad(lambda *a: jnp.sum(_ref(*a, act) * g),
                     argnums=(0, 1, 2))(x, w, b)
    g_pal = jax.grad(
        lambda *a: jnp.sum(conv3x3(*a, act, interpret=True) * g),
        argnums=(0, 1, 2))(x, w, b)
    for name, a, p in zip("xwb", g_ref, g_pal):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(p) / scale,
                                   np.asarray(a) / scale, atol=2e-5,
                                   err_msg=f"grad wrt {name}")


def test_fits_predicate():
    assert fits_conv3x3(192, 640, 32, 32)
    assert not fits_conv3x3(1, 640, 32, 32)      # H < 2
    assert not fits_conv3x3(24, 640, 4096, 32)   # tap stack > VMEM budget


def test_depth_decoder_planar_parity(rng, monkeypatch):
    from ssde_tpu.models.depth_decoder import DepthDecoder

    # encoder pyramid order: largest spatial first, stride-2 apart
    shapes = [(1, 32, 128, 64), (1, 16, 64, 64), (1, 8, 32, 128),
              (1, 4, 16, 256), (1, 2, 8, 512)]
    feats = [jnp.asarray(rng.rand(*s).astype(np.float32)) for s in shapes]

    dec = DepthDecoder(scales=(0, 1, 2, 3))
    params = dec.init(jax.random.PRNGKey(0), feats)

    monkeypatch.delenv("SSDE_PLANAR_DECODER", raising=False)
    monkeypatch.delenv("SSDE_CONV_INTERPRET", raising=False)
    out_nhwc = dec.apply(params, feats)

    monkeypatch.setenv("SSDE_PLANAR_DECODER", "1")
    monkeypatch.setenv("SSDE_CONV_INTERPRET", "1")
    out_planar = dec.apply(params, feats)

    assert set(out_nhwc) == set(out_planar)
    for k in out_nhwc:
        np.testing.assert_allclose(np.asarray(out_planar[k]),
                                   np.asarray(out_nhwc[k]), atol=1e-5,
                                   err_msg=k)


ZCASES = [
    # zero-pad twin (GRU/LSTM cell + ResidualConvUnit convs)
    (2, 6, 8, 128, 16, "none"),
    (1, 5, 4, 131, 8, "tanh"),   # lane-pad path: fill columns must be 0
    pytest.param(2, 8, 16, 96, 8, "sigmoid", marks=pytest.mark.slow),
]


def _ref_zero(x, w, b, act):
    from ssde_tpu.models.common import conv_same_nhwc

    out = conv_same_nhwc(jnp.transpose(x, (0, 1, 3, 2)), w, b)
    if act == "elu":
        out = jax.nn.elu(out)
    elif act == "sigmoid":
        out = jax.nn.sigmoid(out)
    elif act == "tanh":
        out = jnp.tanh(out)
    return jnp.transpose(out, (0, 1, 3, 2))


@pytest.mark.parametrize("B,H,C,W,Cout,act", ZCASES)
def test_conv3x3_zero_fwd_and_grads(rng, B, H, C, W, Cout, act):
    from ssde_tpu.ops.pallas.conv3x3 import conv3x3_zero

    x = jnp.asarray(rng.randn(B, H, C, W).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, Cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(B, H, Cout, W).astype(np.float32))

    o_ref = _ref_zero(x, w, b, act)
    o_pal = conv3x3_zero(x, w, b, act, interpret=True)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               atol=5e-6, rtol=1e-5)

    g_ref = jax.grad(lambda *a: jnp.sum(_ref_zero(*a, act) * g),
                     argnums=(0, 1, 2))(x, w, b)
    g_pal = jax.grad(
        lambda *a: jnp.sum(conv3x3_zero(*a, act, interpret=True) * g),
        argnums=(0, 1, 2))(x, w, b)
    for name, a, p in zip("xwb", g_ref, g_pal):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(p) / scale,
                                   np.asarray(a) / scale, atol=2e-5,
                                   err_msg=f"grad wrt {name}")


def test_gru_cell_planar_parity(rng, monkeypatch):
    """ConvGRUCell planar fast path == NHWC path (params identical)."""
    from ssde_tpu.models.recurrent import ConvGRUCell

    x = jnp.asarray(rng.rand(2, 6, 128, 4).astype(np.float32))
    h = jnp.asarray(rng.rand(2, 6, 128, 8).astype(np.float32))
    cell = ConvGRUCell(hidden_dim=8)
    params = cell.init(jax.random.PRNGKey(0), x, h)

    monkeypatch.setenv("SSDE_PLANAR_GRU", "0")
    ref = cell.apply(params, x, h)
    monkeypatch.setenv("SSDE_PLANAR_GRU", "1")
    monkeypatch.setenv("SSDE_CONV_INTERPRET", "1")
    pal = cell.apply(params, x, h)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

    # gradients flow through the custom-VJP convs identically
    def loss(p, planar):
        monkeypatch.setenv("SSDE_PLANAR_GRU", "1" if planar else "0")
        return jnp.sum(cell.apply(p, x, h) ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    jax.tree.map(
        lambda a, p: np.testing.assert_allclose(np.asarray(p), np.asarray(a),
                                                rtol=1e-5, atol=3e-5),
        g_ref, g_pal)
