"""Frozen-golden checkpoint parity: the REAL zoo loading path end-to-end.

tests/fixtures/golden_mono.npz holds a disparity map produced by the
ACTUAL reference encoder+decoder (seeded weights + non-trivial BN running
stats, scripts/make_golden_fixture.py). This test regenerates those
weights, writes them in the reference checkpoint format, loads them via
``load_monodepth2_checkpoint`` — the converter used for real
mono_640x192 zoo checkpoints (reference utils.py:51-114,
evaluate_depth.py:87-135) — and asserts the flax forward reproduces the
committed map. Unlike test_torch_parity (fresh torch twin each run), a
drift in conversion, BN-stats handling, reflect-pad or resize semantics
fails here against a FROZEN artifact.
"""

import os
import sys

import numpy as np
import pytest

REF = os.environ.get("SSDE_REFERENCE_DIR", "/root/reference")
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_mono.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="golden fixture not generated"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def fixture():
    return np.load(FIXTURE)


def test_golden_disparity_via_zoo_loader(fixture, tmp_path_factory):
    if not os.path.isdir(os.path.join(REF, "networks")):
        pytest.skip("reference checkout not available")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    import make_golden_fixture as gen

    ckpt = str(tmp_path_factory.mktemp("golden_ckpt"))
    image, _, md5 = gen.main(out_path=None, ckpt_dir=ckpt)
    if md5 != str(fixture["state_md5"]):
        pytest.skip("fixture stale: torch RNG stream changed — regenerate "
                    "with scripts/make_golden_fixture.py")

    import jax
    import jax.numpy as jnp

    from ssde_tpu.checkpoint import load_monodepth2_checkpoint
    from ssde_tpu.models import DepthDecoder, ResnetEncoder

    params, stats, meta = load_monodepth2_checkpoint(ckpt)
    assert meta.get("height") == 192 and meta.get("width") == 640

    encoder = ResnetEncoder(18)
    decoder = DepthDecoder(scales=(0, 1, 2, 3))
    x = jnp.asarray(fixture["image"])
    with jax.default_matmul_precision("float32"):
        feats = encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]},
            x, False,
        )
        disp = decoder.apply({"params": params["depth"]}, feats)["disp/0"]

    golden = fixture["disp"]
    err = np.max(np.abs(np.asarray(disp) - golden))
    assert err < 1e-4, f"golden disparity drift: max abs err {err}"


def test_golden_absrel_drift(fixture, tmp_path_factory):
    """The BASELINE headline: depth from converted weights must match the
    reference's depth to well under the 1e-3 AbsRel budget."""
    if not os.path.isdir(os.path.join(REF, "networks")):
        pytest.skip("reference checkout not available")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    import make_golden_fixture as gen

    ckpt = str(tmp_path_factory.mktemp("golden_ckpt2"))
    _, _, md5 = gen.main(out_path=None, ckpt_dir=ckpt)
    if md5 != str(fixture["state_md5"]):
        pytest.skip("fixture stale: torch RNG stream changed")

    import jax
    import jax.numpy as jnp

    from ssde_tpu.checkpoint import load_monodepth2_checkpoint
    from ssde_tpu.models import DepthDecoder, ResnetEncoder
    from ssde_tpu.ops import disp_to_depth

    params, stats, _ = load_monodepth2_checkpoint(ckpt)
    encoder = ResnetEncoder(18)
    decoder = DepthDecoder(scales=(0, 1, 2, 3))
    x = jnp.asarray(fixture["image"])
    with jax.default_matmul_precision("float32"):
        feats = encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]},
            x, False,
        )
        disp = decoder.apply({"params": params["depth"]}, feats)["disp/0"]

    _, depth_ours = disp_to_depth(jnp.asarray(np.asarray(disp)), 0.1, 100.0)
    _, depth_gold = disp_to_depth(jnp.asarray(fixture["disp"]), 0.1, 100.0)
    abs_rel = float(jnp.mean(jnp.abs(depth_ours - depth_gold) / depth_gold))
    assert abs_rel < 1e-4, f"AbsRel drift {abs_rel} vs 1e-3 budget"
