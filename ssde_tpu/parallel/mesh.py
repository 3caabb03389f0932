"""Device mesh + sharding for data-parallel training over ICI.

The reference's only parallelism is manual model-parallel placement via
per-module ``cuda:N`` flags and explicit ``.to(device)`` tensor shuffling
(reference trainer.py:44-111, 259-373, options.py:133-162). On TPU that
whole layer disappears: we build one ``jax.sharding.Mesh`` over the chips,
shard the batch axis with a NamedSharding, replicate parameters, and let
XLA insert the gradient AllReduce over ICI during ``jit`` compilation.

Batch-norm note: statistics are computed over the *global* (sharded) batch
axis, so data-parallel training uses sync-BN semantics — the mean/variance
reductions become cross-device collectives automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None,
              batch_size: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over ICI. ``num_devices==0`` -> all devices.

    When ``batch_size`` is given, the mesh is clamped to the largest device
    count that divides it (a batch of 2 on an 8-chip host uses 2 chips
    rather than failing to shard)."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n:
            n -= 1
        devices = devices[:n]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_to_device(tree, sharding):
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def device_prefetch(iterator, mesh: Mesh, size: int = 2):
    """Host->device batch handoff, shaped by MEASUREMENT per mesh size.

    Single device: yield host batches directly and let the jit boundary
    transfer them. A/B on the tunneled v5e (scripts/bench_loader.py
    --fed, 2026-08-21): direct 44.0 / 28.7 samples/s vs explicit
    ``device_put`` prefetch 2.1-3.9 — this runtime's explicit put of
    host numpy is 10-20x slower than the dispatch-path transfer, so
    "overlap" via device_put is a large net loss. Set
    SSDE_DEVICE_PREFETCH=1 to force the double-buffered explicit-put
    pipeline (the canonical overlap on standard TPU hosts, the analogue
    of the reference's pin_memory+non_blocking DataLoader,
    trainer.py:155-163).

    Multiple devices: explicit ``shard_batch`` is required for
    correctness (the batch axis must land sharded over the mesh), and
    the double buffer keeps one batch's DMA in flight behind the step.
    """
    import os
    from collections import deque

    explicit = (len(mesh.devices.flat) > 1
                or os.environ.get("SSDE_DEVICE_PREFETCH") == "1")
    if not explicit:
        for batch in iterator:
            yield batch
        return
    buf = deque()
    for batch in iterator:
        buf.append(shard_batch(batch, mesh))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


# --------------------------------------------------------------- model axis
#
# The reference CAN span one model across several GPUs by hand
# (``cuda:N`` per module + explicit .to() shuffling, trainer.py:44-111);
# the TPU-native equivalent is tensor parallelism: a second mesh axis and
# channel-sharded parameters. For the 15-35M-param CNNs here DP alone is
# the right production strategy, but the capability is first-class: shard
# every conv/dense kernel's output-channel axis over "model" and XLA's
# SPMD partitioner turns the convs into per-shard convs + the exact
# AllReduces the manual placement would need (inserted over ICI, not
# hand-written NCCL).

MODEL_AXIS = "model"


def make_mesh_2d(data: int = 0, model: int = 1, devices=None) -> Mesh:
    """(data, model) mesh. ``data==0`` -> use all remaining devices."""
    if devices is None:
        devices = jax.devices()
    if not data:
        data = len(devices) // model
    devices = np.array(devices[:data * model]).reshape(data, model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def model_sharded_params(params, mesh: Mesh):
    """Place a param tree with conv/dense kernels output-channel-sharded.

    Kernels (ndim>=2) shard their trailing (out-channel) axis over
    MODEL_AXIS when divisible; biases/scales/h0 replicate. Gradients and
    Adam moments inherit these placements through jit, so optimizer state
    is sharded too (a free memory win on big models)."""
    axis = mesh.shape[MODEL_AXIS]

    def place(x):
        if x.ndim >= 2 and x.shape[-1] % axis == 0:
            spec = P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)
