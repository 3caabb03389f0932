"""Fast-tier end-to-end trainer smoke (round-3 verdict item 7).

One tiny ``Trainer.train()`` — 32x64, B=2, 2 optimizer steps, single
scale — in the DEFAULT suite, so checkpoint/logging/loader glue
regressions surface without ``-m slow``. The full multi-scale loops stay
in test_trainers.py (slow tier).
"""

import os

import pytest

from ssde_tpu.config import Options

# 96 s on this host (two trainer compiles + resume) -> slow tier; the
# trainer loop's fast-tier signal is tests/test_device_prefetch +
# test_train_step (round-5 re-tier)
pytestmark = pytest.mark.slow


def test_mono_trainer_smoke_and_resume(tmp_path):
    from ssde_tpu.train.trainer import Trainer

    opts = Options(
        height=32, width=64, batch_size=2, num_layers=18,
        compute_dtype="float32", num_epochs=1, num_workers=1,
        synthetic_data=True, log_dir=str(tmp_path), model_name="smoke",
        log_frequency=1000, mono_pretrained=0, scales=[0],
        use_pallas=False,
    )
    trainer = Trainer(opts)
    # 2 steps only: shrink the synthetic dataset (Loader reads len() live)
    trainer.train_dataset.length = 4
    trainer.train()
    assert trainer.step >= 2

    folder = os.path.join(trainer.log_path, "models", "weights_0")
    for mod in ("encoder", "depth", "pose_encoder", "pose", "adam"):
        assert os.path.exists(os.path.join(folder, f"{mod}.ckpt")), mod
    assert os.path.exists(os.path.join(trainer.log_path, "models", "opt.json"))

    # resume from the checkpoint (same glue evaluate_depth relies on)
    opts2 = Options(
        height=32, width=64, batch_size=2, num_layers=18,
        compute_dtype="float32", num_epochs=1, num_workers=1,
        synthetic_data=True, log_dir=str(tmp_path), model_name="smoke2",
        log_frequency=1000, mono_pretrained=0, scales=[0],
        use_pallas=False, load_weights_folder=folder,
    )
    trainer2 = Trainer(opts2)
    import numpy as np

    a = np.asarray(jax_leaf(trainer.state.params))
    b = np.asarray(jax_leaf(trainer2.state.params))
    assert np.allclose(a, b), "resume did not load the saved weights"


def jax_leaf(params):
    import jax

    return jax.tree_util.tree_leaves(params)[0]
