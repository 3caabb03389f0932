"""device_prefetch: double-buffered H2D transfer keeps order + placement."""

import jax
import numpy as np

from ssde_tpu.parallel import batch_sharding, device_prefetch, make_mesh


def test_order_count_and_placement():
    mesh = make_mesh(1, batch_size=4)
    batches = [{"x": np.full((4, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, size=2))
    assert len(out) == 5
    sh = batch_sharding(mesh)
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i  # order preserved
        assert b["x"].sharding.is_equivalent_to(sh, b["x"].ndim)


def test_short_iterator():
    mesh = make_mesh(1, batch_size=2)
    batches = [{"x": np.zeros((2,), np.float32)}]
    assert len(list(device_prefetch(iter(batches), mesh, size=2))) == 1


def test_trainer_uses_prefetch():
    # the overlap path must be the trainer DEFAULT (round-4 verdict item
    # 5): guard against a silent revert to synchronous shard_batch
    import inspect

    from ssde_tpu.train.trainer import TrainerBase

    src = inspect.getsource(TrainerBase.run_epoch)
    assert "device_prefetch" in src
