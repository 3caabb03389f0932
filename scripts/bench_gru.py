#!/usr/bin/env python
"""Flagship GRU sequence-training benchmark (BASELINE config #4 shape).

Measures frame-samples/s of the jitted GRU train step at B=8, T=3,
640x192 bf16 for the requested versions (default: v10, the perf default,
and v9, the attention-fusion flagship) and prints one JSON line per
version. Synthetic device-resident data — this isolates the step itself,
like bench.py.

Env: BENCH_GRU_VERSIONS="v9,v10"  BENCH_BATCH=8  BENCH_T=3  BENCH_STEPS=10
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(version, B, T, n_steps, H, W):
    import jax

    from ssde_tpu.config import Options
    from ssde_tpu.data.pipeline import collate
    from ssde_tpu.data.synthetic import SyntheticSeqDataset
    from ssde_tpu.train.state import TrainState, create_optimizer
    from ssde_tpu.train.steps_gru import (
        build_gru_models,
        init_gru_params,
        make_gru_train_step,
    )

    opts = Options(height=H, width=W, batch_size=B, len_sequence=T,
                   num_layers=18, compute_dtype="bfloat16",
                   gru_version=version, scales=[0, 1, 2, 3],
                   gru_remat=os.environ.get("BENCH_GRU_REMAT", "auto"))
    ds = SyntheticSeqDataset(H, W, n=T, length=B)
    batch = collate([ds[i] for i in range(B)])
    batch = jax.tree.map(jax.device_put, batch)
    models = build_gru_models(opts)
    params, stats = init_gru_params(models, jax.random.PRNGKey(0), batch)
    state = TrainState.create(params, stats, create_optimizer(1e-4, 0, 10))
    step = make_gru_train_step(models)
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    float(losses["loss"])  # force completion through a device->host read
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    float(losses["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"kitti_{W}x{H}_gru_{version}_train_frame_samples_per_sec",
        "value": round(B * T * n_steps / dt, 2),
        "unit": "frame-samples/s",
        "batch": B, "seq_len": T,
        "ms_per_step": round(dt / n_steps * 1e3, 1),
    }), flush=True)


def main():
    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()
    versions = os.environ.get("BENCH_GRU_VERSIONS", "v10,v9").split(",")
    B = int(os.environ.get("BENCH_BATCH", "8"))
    T = int(os.environ.get("BENCH_T", "3"))
    n = int(os.environ.get("BENCH_STEPS", "10"))
    H = int(os.environ.get("BENCH_H", "192"))
    W = int(os.environ.get("BENCH_W", "640"))
    for v in versions:
        bench(v.strip(), B, T, n, H, W)


if __name__ == "__main__":
    main()
