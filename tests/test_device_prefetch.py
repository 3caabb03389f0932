"""device_prefetch: measured-fast handoff per mesh size (see mesh.py).

Single device defaults to the direct jit-boundary transfer (A/B
measured 10-20x faster than explicit device_put on the tunneled
runtime); SSDE_DEVICE_PREFETCH=1 forces the explicit double-buffered
pipeline, which is also the multi-device (sharded) path.
"""

import jax
import numpy as np

from ssde_tpu.parallel import batch_sharding, device_prefetch, make_mesh


def _batches(n, b=4):
    return [{"x": np.full((b, 2), i, np.float32)} for i in range(n)]


def test_default_single_device_passthrough():
    mesh = make_mesh(1, batch_size=4)
    out = list(device_prefetch(iter(_batches(3)), mesh))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert isinstance(b["x"], np.ndarray)  # host array: direct handoff
        assert b["x"][0, 0] == i


def test_explicit_path_orders_and_places(monkeypatch):
    monkeypatch.setenv("SSDE_DEVICE_PREFETCH", "1")
    mesh = make_mesh(1, batch_size=4)
    out = list(device_prefetch(iter(_batches(5)), mesh, size=2))
    assert len(out) == 5
    sh = batch_sharding(mesh)
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i  # order preserved
        assert b["x"].sharding.is_equivalent_to(sh, b["x"].ndim)


def test_short_iterator(monkeypatch):
    monkeypatch.setenv("SSDE_DEVICE_PREFETCH", "1")
    mesh = make_mesh(1, batch_size=2)
    batches = [{"x": np.zeros((2,), np.float32)}]
    assert len(list(device_prefetch(iter(batches), mesh, size=2))) == 1


def test_trainer_uses_prefetch():
    # the handoff path must stay routed through device_prefetch so the
    # per-mesh-size measurement (and the multi-device sharded path)
    # keeps applying to the trainer loop
    import inspect

    from ssde_tpu.train.trainer import TrainerBase

    src = inspect.getsource(TrainerBase.run_epoch)
    assert "device_prefetch" in src
