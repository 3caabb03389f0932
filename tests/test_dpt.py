"""DPT-hybrid model tests (models/dpt.py; reference trainer_dpt.py:63-70).

The reference's dpt package is un-vendored so there is no torch twin to
compare against; these tests pin the architectural contract: shapes,
hook/attention structure, gradient flow, and the end-to-end train step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.models.dpt import DPTDepthModel, get_mean_attention_map

H, W = 64, 96  # /32 legal, 4x6 token grid


@pytest.fixture(scope="module")
def model_and_params():
    model = DPTDepthModel()
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    return model, variables


def test_forward_shapes(model_and_params):
    model, variables = model_and_params
    x = jnp.linspace(0, 1, 2 * H * W * 3).reshape(2, H, W, 3)
    out = model.apply(variables, x, False)
    assert out["disp/0"].shape == (2, H, W, 1)
    assert float(out["disp/0"].min()) > 0 and float(out["disp/0"].max()) < 1
    assert out["inv_depth"].shape == (2, H, W)
    assert float(out["inv_depth"].min()) >= 0  # non_negative head


def test_attention_capture(model_and_params):
    model, variables = model_and_params
    x = jnp.zeros((1, H, W, 3))
    out = model.apply(variables, x, False, capture_attention=True)
    attn = out["attention"]
    gh, gw = H // 16, W // 16
    n = gh * gw + 1
    assert set(attn) == {"attn_1", "attn_2", "attn_3", "attn_4"}
    for v in attn.values():
        assert v.shape == (1, 12, n, n)
        np.testing.assert_allclose(np.asarray(v.sum(-1)), 1.0, atol=1e-4)
    m = get_mean_attention_map(attn["attn_4"], 1, (gh, gw))
    assert m.shape == (1, gh, gw)


@pytest.mark.slow  # full ViT-B backward on CPU
def test_gradients_reach_all_leaves(model_and_params):
    model, variables = model_and_params
    x = jnp.linspace(0, 1, H * W * 3).reshape(1, H, W, 3)

    def loss(p):
        out = model.apply({"params": p, "batch_stats": variables.get("batch_stats", {})}, x, False)
        return jnp.mean(out["disp/0"])

    g = jax.grad(loss)(variables["params"])
    zero = [k for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    # bias-like leaves can be zero-grad on tiny inputs; the backbone and
    # head kernels must not be
    kernels = [p for p, v in jax.tree_util.tree_leaves_with_path(g)
               if "kernel" in str(p)]
    dead = [p for p, v in jax.tree_util.tree_leaves_with_path(g)
            if "kernel" in str(p) and float(jnp.max(jnp.abs(v))) == 0.0]
    assert kernels and len(dead) < len(kernels) * 0.1, dead[:5]


@pytest.mark.slow
def test_dpt_train_step_end_to_end():
    from ssde_tpu.config import Options
    from ssde_tpu.data import make_synthetic_batch
    from ssde_tpu.data.transforms import preprocess_batch
    from ssde_tpu.train.state import TrainState, create_optimizer
    from ssde_tpu.train.steps_dpt import (
        build_dpt_models,
        init_dpt_params,
        make_dpt_train_step,
    )

    opts = Options(height=32, width=64, batch_size=2, num_layers=18,
                   compute_dtype="float32", frame_ids=[0, -1, 1], scales=[0])
    models = build_dpt_models(opts)
    batch = make_synthetic_batch(2, 32, 64)
    inputs = preprocess_batch(batch, 32, 64, 1, opts.frame_ids)
    params, batch_stats = init_dpt_params(models, jax.random.PRNGKey(0), inputs)
    state = TrainState.create(params, batch_stats,
                              create_optimizer(1e-4, 15, 10))
    step = make_dpt_train_step(models)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))
    assert int(state.step) == 1


def test_visualize_attention_smoke(tmp_path, model_and_params):
    pytest.importorskip("matplotlib")
    from ssde_tpu.viz import visualize_attention

    model, variables = model_and_params
    x = jnp.linspace(0, 1, H * W * 3).reshape(1, H, W, 3)
    out = model.apply(variables, x, False, capture_attention=True)
    path = str(tmp_path / "attn.png")
    visualize_attention(np.asarray(x[0]), out["attention"],
                        np.asarray(out["inv_depth"][0]), (H // 16, W // 16),
                        save_path=path)
    import os

    assert os.path.getsize(path) > 0
