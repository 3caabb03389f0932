"""Real-scale frozen-golden parity for the GRU and fusion families.

tests/fixtures/golden_seq.npz (scripts/make_golden_fixture_seq.py) holds
full-resolution (640x192) disparity maps produced by the ACTUAL reference
ConvGRUBlocks_v9 — at the h0 sizes it hard-codes for this resolution
(rnn.py:480-516) — and Fusion_v3(attention=True) with seeded weights.
These tests regenerate the weights from the seed, convert them through
``convert_gru_blocks`` / ``convert_fusion_v2`` (the converters the real
zoo/experiment checkpoints use, reference trainer_gru.py:81-120), run
the flax forwards at the real weight scale, and assert the committed
maps are reproduced.

Complements tests/test_golden_checkpoint.py (mono encoder/decoder): with
zero network egress the published mono_640x192 weights cannot be fetched
(verified round 4/5, PLAN.md), so real-scale seeded goldens freeze the
whole conversion + forward surface instead.
"""

import os
import sys

import numpy as np
import pytest

REF = os.environ.get("SSDE_REFERENCE_DIR", "/root/reference")
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_seq.npz")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(FIXTURE),
                       reason="golden fixture not generated"),
    pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "networks")),
                       reason="reference checkout not available"),
]

torch = pytest.importorskip("torch")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "scripts"))


@pytest.fixture(scope="module")
def fixture():
    return np.load(FIXTURE)


def _t2j(x):
    import jax.numpy as jnp

    a = x.detach().numpy()
    if a.ndim == 4:
        a = a.transpose(0, 2, 3, 1)
    return jnp.asarray(a)


def test_golden_gru_v9_full_res(fixture, tmp_path):
    import make_golden_fixture_seq as gen

    tm = gen.build_gru()
    if gen._state_md5(tm) != str(fixture["gru_md5"]):
        pytest.skip("fixture stale: torch RNG stream changed — regenerate "
                    "with scripts/make_golden_fixture_seq.py")

    import jax

    from ssde_tpu.checkpoint import _load_torch_state_dict, convert_gru_blocks
    from ssde_tpu.models.recurrent import make_gru

    path = os.path.join(str(tmp_path), "gru.pth")
    torch.save(tm.state_dict(), path)
    params = convert_gru_blocks(_load_torch_state_dict(path))

    dec = gen.gru_inputs()
    j_dec = {f"disp/{s}": _t2j(dec[("disp", s)]) for s in range(4)}
    hidden = [
        _t2j(tm.state_dict()[f"cgru_{s}.h0_layer1"]) for s in range(4)
    ]

    jm = make_gru("v9", gen.H, gen.W, attention=True)
    with jax.default_matmul_precision("float32"):
        _, j_disp = jm.apply({"params": params}, j_dec, hidden)

    for s in range(4):
        golden = fixture[f"gru_disp_{s}"].transpose(0, 2, 3, 1)
        got = np.asarray(j_disp[f"disp/{s}"], np.float32)
        err = np.max(np.abs(got - golden))
        # chained attention softmaxes at full scale: f32 reassociation
        # noise only (the composition is exact in f64, test_torch_parity)
        assert err < 2e-3, f"gru golden drift at scale {s}: {err}"


def test_golden_fusion_v3_full_res(fixture, tmp_path):
    import make_golden_fixture_seq as gen

    tm = gen.build_fusion()
    if gen._state_md5(tm) != str(fixture["fusion_md5"]):
        pytest.skip("fixture stale: torch RNG stream changed — regenerate "
                    "with scripts/make_golden_fixture_seq.py")

    import jax

    from ssde_tpu.checkpoint import _load_torch_state_dict, convert_fusion_v2
    from ssde_tpu.models.fusion import Fusion_v3

    path = os.path.join(str(tmp_path), "fusion.pth")
    torch.save(tm.state_dict(), path)
    params = convert_fusion_v2(_load_torch_state_dict(path))

    stacked = gen.fusion_inputs()
    B = 1
    dec = {f"disp/{s}": _t2j(stacked[("disp", s)][:B]) for s in range(4)}
    d1 = {f"disp/{s}": _t2j(stacked[("disp", s)][B:2 * B]) for s in range(4)}
    d2 = {f"disp/{s}": _t2j(stacked[("disp", s)][2 * B:]) for s in range(4)}

    jm = Fusion_v3(attention=True)
    with jax.default_matmul_precision("float32"):
        j_out = jm.apply({"params": params}, dec, d1, d2)

    for s in range(4):
        golden = fixture[f"fusion_disp_{s}"].transpose(0, 2, 3, 1)
        got = np.asarray(j_out[f"disp/{s}"], np.float32)
        err = np.max(np.abs(got - golden))
        assert err < 2e-3, f"fusion golden drift at scale {s}: {err}"
