"""Tests for ConvGRU/ConvLSTM cells and blocks v1..v10 (small resolutions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.models import ConvGRUCell, ConvLSTMCell, ConvGRUBlocks, Head, make_gru

H, W = 32, 64  # scale-0 resolution for tests


def test_conv_gru_cell_matches_reference_math(rng):
    """Cell output equals the reference gate equations computed with torch."""
    import torch

    B, h, w, cin, hid = 1, 4, 6, 3, 5
    x = rng.rand(B, h, w, cin).astype(np.float32)
    hst = rng.rand(B, h, w, hid).astype(np.float32)

    cell = ConvGRUCell(hid)
    variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(hst))
    ours = np.asarray(cell.apply(variables, jnp.asarray(x), jnp.asarray(hst)))

    p = variables["params"]
    # flax conv kernel (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
    wg = np.transpose(np.asarray(p["conv_gates"]["kernel"]), (3, 2, 0, 1))
    bg = np.asarray(p["conv_gates"]["bias"])
    wc = np.transpose(np.asarray(p["conv_can"]["kernel"]), (3, 2, 0, 1))
    bc = np.asarray(p["conv_can"]["bias"])

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ht = torch.from_numpy(np.transpose(hst, (0, 3, 1, 2)))
    combined = torch.cat([xt, ht], 1)
    gates = torch.nn.functional.conv2d(
        combined, torch.from_numpy(wg), torch.from_numpy(bg), padding=1
    )
    gamma, beta = torch.split(gates, hid, dim=1)
    reset, update = torch.sigmoid(gamma), torch.sigmoid(beta)
    combined = torch.cat([xt, reset * ht], 1)
    cand = torch.tanh(
        torch.nn.functional.conv2d(
            combined, torch.from_numpy(wc), torch.from_numpy(bc), padding=1
        )
    )
    ref = ((1 - update) * ht + update * cand).numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)), atol=3e-5)


def test_conv_lstm_cell_shapes(rng):
    B, h, w, cin, hid = 2, 4, 6, 3, 5
    x = jnp.asarray(rng.rand(B, h, w, cin).astype(np.float32))
    hc = (jnp.zeros((B, h, w, hid)), jnp.zeros((B, h, w, hid)))
    cell = ConvLSTMCell(hid)
    variables = cell.init(jax.random.PRNGKey(0), x, hc)
    h_next, c_next = cell.apply(variables, x, hc)
    assert h_next.shape == (B, h, w, hid)
    assert c_next.shape == (B, h, w, hid)


def _pre_disp(rng, B, ch):
    return {
        f"disp/{s}": jnp.asarray(
            rng.rand(B, H // 2**s, W // 2**s, ch[s]).astype(np.float32)
        )
        for s in range(4)
    }


@pytest.mark.parametrize("version,ch,has_disp", [
    ("v1", (1, 1, 1, 1), True),
    ("v2", (1, 1, 1, 1), True),
    ("v3", (16, 32, 64, 128), True),
    ("v4", (16, 32, 64, 128), False),
    ("v7", (16, 32, 64, 128), False),
    ("v8", (16, 32, 64, 128), True),
    ("v9", (16, 32, 64, 128), True),
    ("v10", (16, 32, 64, 128), True),
])
def test_gru_blocks_step(rng, version, ch, has_disp):
    B = 2
    dec = _pre_disp(rng, B, ch)
    block = make_gru(version, H, W, attention=False)
    zeros_state = _zeros_state(version, B)
    variables = block.init(jax.random.PRNGKey(0), dec, zeros_state)
    hidden0 = block.apply(variables, B, method=ConvGRUBlocks.initial_state)
    new, disp = block.apply(variables, dec, hidden0)
    assert len(new) == 4
    if has_disp:
        for s in range(4):
            d = disp[f"disp/{s}"]
            if version in ("v1", "v3"):
                assert d.shape == (B, H // 2**s, W // 2**s, 1)
            else:
                assert d.shape[-1] == 1
            vals = np.asarray(d)
            if version not in ():
                assert np.isfinite(vals).all()
    else:
        assert disp is None


def _zeros_state(version, B):
    from ssde_tpu.models.recurrent import GRU_HIDDEN_SPECS

    spec = GRU_HIDDEN_SPECS[version if version != "v6" else "v4"]
    states = []
    for s, hid in enumerate(spec["hid"]):
        div = 2 ** (s + 1) if version == "v5" else 2**s
        shape = (B, H // div, W // div, hid)
        if spec["cell"] == "lstm":
            states.append((jnp.zeros(shape), jnp.zeros(shape)))
        else:
            states.append(jnp.zeros(shape))
    return states


def test_gru_v5_encoder_features(rng):
    B = 1
    ch = (64, 64, 128, 256, 512)
    feats = [
        jnp.asarray(rng.rand(B, H // 2 ** (s + 1), W // 2 ** (s + 1), ch[s]).astype(np.float32))
        for s in range(5)
    ]
    block = make_gru("v5", H, W)
    zeros_state = _zeros_state("v5", B)
    variables = block.init(jax.random.PRNGKey(0), feats, zeros_state)
    hidden0 = block.apply(variables, B, method=ConvGRUBlocks.initial_state)
    new, disp = block.apply(variables, feats, hidden0)
    assert len(new) == 5 and disp is None
    for s in range(5):
        assert new[s].shape == feats[s].shape


def test_gru_scan_over_time(rng):
    """lax.scan unroll over T steps: replaces the reference's Python loop."""
    B, T = 1, 3
    block = make_gru("v3", H, W)
    dec_seq = {
        f"disp/{s}": jnp.asarray(
            rng.rand(T, B, H // 2**s, W // 2**s, c).astype(np.float32)
        )
        for s, c in zip(range(4), (16, 32, 64, 128))
    }
    dec0 = {k: v[0] for k, v in dec_seq.items()}
    variables = block.init(jax.random.PRNGKey(0), dec0, _zeros_state("v3", B))
    h0 = block.apply(variables, B, method=ConvGRUBlocks.initial_state)

    def step(h, dec_t):
        h_new, disp = block.apply(variables, dec_t, h)
        return h_new, disp["disp/0"]

    h_final, disps = jax.lax.scan(step, h0, dec_seq)
    assert disps.shape == (T, B, H, W, 1)
    # recurrence actually evolves the state
    assert not np.allclose(np.asarray(h_final[0]), np.asarray(h0[0]))


def test_head_v4(rng):
    ch = (16, 32, 64, 128)
    outputs = {
        f"disp/{s}": jnp.asarray(
            rng.rand(1, H // 2**s, W // 2**s, ch[s]).astype(np.float32)
        )
        for s in range(4)
    }
    head = Head(channels=ch)
    variables = head.init(jax.random.PRNGKey(0), outputs)
    disp = head.apply(variables, outputs)
    for s in range(4):
        assert disp[f"disp/{s}"].shape[-1] == 1


@pytest.mark.parametrize("version,attention", [
    ("v10", False),
    # v9's planar attention chain is a 92 s compile on this host -> slow
    pytest.param("v9", True, marks=pytest.mark.slow),
])
def test_gru_blocks_planar_parity(rng, monkeypatch, version, attention):
    """Full-planar v9/v10 block (chain-padded Pallas scan body, planar
    carry; v9 adds the planar attention-fusion path) matches the NHWC
    path over two chained steps; W=64 exercises heavy chain padding
    (wl=64 on a 128-wide physical buffer)."""
    B = 2
    ch = (16, 32, 64, 128)
    dec = _pre_disp(rng, B, ch)
    dec2 = _pre_disp(np.random.RandomState(7), B, ch)
    monkeypatch.setenv("SSDE_PLANAR_GRU", "0")
    block = make_gru(version, H, W, attention=attention)
    variables = block.init(jax.random.PRNGKey(0), dec,
                           _zeros_state(version, B))

    def two_steps():
        h0 = block.apply(variables, B, method=ConvGRUBlocks.initial_state)
        h1, d1 = block.apply(variables, dec, h0)
        _, d2 = block.apply(variables, dec2, h1)
        return d1, d2

    d1r, d2r = two_steps()

    monkeypatch.setenv("SSDE_PLANAR_GRU", "1")
    monkeypatch.setenv("SSDE_CONV_INTERPRET", "1")
    from ssde_tpu.models.recurrent import _gru_planar_cfg

    assert any(c[0] for c in _gru_planar_cfg(version, H, W, attention, 4))
    d1p, d2p = two_steps()

    for k in d1r:
        np.testing.assert_allclose(np.asarray(d1p[k]), np.asarray(d1r[k]),
                                   atol=3e-5, err_msg=f"step1 {k}")
        np.testing.assert_allclose(np.asarray(d2p[k]), np.asarray(d2r[k]),
                                   atol=3e-5, err_msg=f"step2 {k}")
