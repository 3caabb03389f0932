"""End-to-end GRU and fusion train steps on tiny synthetic sequences."""

import numpy as np
import jax
import pytest

from ssde_tpu.config import Options
from ssde_tpu.data import make_synthetic_batch
from ssde_tpu.data.pipeline import collate
from ssde_tpu.data.synthetic import SyntheticSeqDataset
from ssde_tpu.train.state import TrainState, create_optimizer
from ssde_tpu.train.steps_fusion import (
    build_fusion_models,
    init_fusion_params,
    make_fusion_train_step,
)
from ssde_tpu.train.steps_gru import (
    build_gru_models,
    init_gru_params,
    make_gru_train_step,
)
from ssde_tpu.data.transforms import preprocess_batch

H, W = 32, 64


def _gru_opts(version):
    return Options(
        height=H, width=W, batch_size=2, len_sequence=2, num_layers=18,
        compute_dtype="float32", gru_version=version, disable_attention=True,
        scales=[0, 1, 2, 3],
    )


def _seq_batch(opts):
    ds = SyntheticSeqDataset(opts.height, opts.width, n=opts.len_sequence,
                             length=opts.batch_size)
    return collate([ds[i] for i in range(opts.batch_size)])


@pytest.mark.parametrize(
    "version",
    # every jitted GRU train-step compile is >60 s on this 1-core host
    # (round-5 re-tier: fast tier <= 10 min); module-level GRU coverage
    # stays fast via test_recurrent, the mono train step via
    # test_train_step
    [pytest.param(v, marks=pytest.mark.slow)
     for v in ("v10", "v9", "v3", "v4", "v7", "v5", "v8")],
)
def test_gru_train_step(version):
    opts = _gru_opts(version)
    batch = _seq_batch(opts)
    models = build_gru_models(opts)
    params, batch_stats = init_gru_params(models, jax.random.PRNGKey(0), batch)
    tx = create_optimizer(1e-4, 15, 10)
    state = TrainState.create(params, batch_stats, tx)
    step = make_gru_train_step(models)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_gru_train_step_improves():
    opts = _gru_opts("v9")
    batch = _seq_batch(opts)
    models = build_gru_models(opts)
    params, batch_stats = init_gru_params(models, jax.random.PRNGKey(0), batch)
    tx = create_optimizer(1e-3, 15, 10)
    state = TrainState.create(params, batch_stats, tx)
    step = make_gru_train_step(models)
    first = None
    rng = jax.random.PRNGKey(0)
    for _ in range(4):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
        if first is None:
            first = float(losses["loss"])
    assert float(losses["loss"]) < first


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["pyramid", "v3", "scale_loop"])
def test_fusion_train_step(variant):
    # slow tier: each variant is a full multi-frame train-step compile
    # (~2 min on a 1-core host); module-level fusion forwards stay fast
    # in test_models.py
    opts = Options(
        height=H, width=W, batch_size=2, num_layers=18,
        compute_dtype="float32", frame_ids=[0, -2, -1, 1],
        disable_attention=True, scales=[0, 1, 2, 3],
    )
    batch = make_synthetic_batch(2, H, W, frame_idxs=(0, -1, -2, 1))
    models = build_fusion_models(opts, variant)
    inputs = preprocess_batch(batch, H, W, 4, [0, -1, -2, 1], is_train=False)
    params, batch_stats = init_fusion_params(models, jax.random.PRNGKey(0), inputs)
    tx = create_optimizer(1e-4, 15, 10)
    state = TrainState.create(params, batch_stats, tx)
    step = make_fusion_train_step(models)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))


@pytest.mark.slow
def test_gru_train_step_t10():
    """len_sequence=10 — the reference's DEFAULT sequence length
    (options.py:54-57): the T-scan + version-aware remat policy at the
    regime that actually stresses the hidden-state memory accounting.
    (Real-chip fs/s for this regime is recorded by bench.py as
    gru_v10_T10_frame_samples_per_sec.)"""
    opts = _gru_opts("v10")
    opts.len_sequence = 10
    batch = _seq_batch(opts)
    models = build_gru_models(opts)
    params, batch_stats = init_gru_params(models, jax.random.PRNGKey(0), batch)
    state = TrainState.create(params, batch_stats, create_optimizer(1e-4, 15, 10))
    step = make_gru_train_step(models)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))
    # every timestep contributed: the scan consumed all T center frames
    assert int(state.step) == 1
