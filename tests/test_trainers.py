"""Hermetic end-to-end trainer smoke tests (synthetic data, tiny dims)."""

import os

import numpy as np
import pytest

from ssde_tpu.config import Options

# full Trainer loops (train-step + val-step + infer compiles each) are the
# most expensive jits in the suite -> slow tier; the step-level fast tests
# in test_train_step/test_gru_fusion_steps cover the compute path
pytestmark = pytest.mark.slow


def tiny_opts(tmp_path, **kw):
    defaults = dict(
        height=32, width=64, batch_size=2, num_layers=18,
        compute_dtype="float32", num_epochs=1, num_workers=1,
        synthetic_data=True, log_dir=str(tmp_path), model_name="t",
        log_frequency=1000, mono_pretrained=0, disable_attention=True,
        scales=[0, 1, 2, 3],
    )
    defaults.update(kw)
    return Options(**defaults)


def test_mono_trainer_end_to_end(tmp_path):
    from ssde_tpu.train.trainer import Trainer

    trainer = Trainer(tiny_opts(tmp_path))
    trainer.train()
    # one epoch ran, a checkpoint folder exists with the per-module contract
    folder = os.path.join(trainer.log_path, "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "encoder.ckpt"))
    assert os.path.exists(os.path.join(folder, "depth.ckpt"))
    assert os.path.exists(os.path.join(folder, "adam.ckpt"))
    assert os.path.exists(os.path.join(trainer.log_path, "models", "opt.json"))

    # resume: a fresh trainer loads the checkpoint
    opts2 = tiny_opts(tmp_path, load_weights_folder=folder)
    trainer2 = Trainer(opts2)
    assert int(trainer2.state.step) == 0  # fresh step counter, loaded weights


def test_gru_trainer_end_to_end(tmp_path):
    from ssde_tpu.train.trainer_gru import GRUTrainer

    opts = tiny_opts(tmp_path, gru_version="v9", len_sequence=2, h_s_epoch=0)
    trainer = GRUTrainer(opts)
    trainer.train()  # h_s_epoch=0 exercises the h0 freeze path immediately
    folder = os.path.join(trainer.log_path, "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "gru.ckpt"))
