#!/usr/bin/env python
"""Op-level profile of the real B=48 train step (perfetto trace parse).

Runs the jitted mono train step under jax.profiler.trace and aggregates
the TPU-track complete events from the dumped trace.json.gz by op name,
printing the top ops by total device time per step. This is the ground
truth the chained-ablation decomposition can't give (and the tunnel's
RPC jitter can't corrupt: durations come from the device trace, not
host wall clocks).

Usage: BENCH_BATCH=48 PROF_STEPS=5 python scripts/profile_ops.py
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(tmpdir):
    import jax

    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from ssde_tpu.config import Options
    from ssde_tpu.data import make_synthetic_batch
    from ssde_tpu.data.transforms import preprocess_batch
    from ssde_tpu.train import (
        TrainState,
        build_mono_models,
        create_optimizer,
        init_mono_params,
        make_mono_train_step,
    )

    B = int(os.environ.get("BENCH_BATCH", "48"))
    n = int(os.environ.get("PROF_STEPS", "5"))
    opts = Options(height=192, width=640, batch_size=B, num_layers=18,
                   compute_dtype="bfloat16", frame_ids=[0, -1, 1],
                   scales=[0, 1, 2, 3])
    models = build_mono_models(opts)
    batch = make_synthetic_batch(B, opts.height, opts.width)
    batch = jax.tree.map(jax.device_put, batch)
    inputs = preprocess_batch(batch, opts.height, opts.width, opts.num_scales,
                              opts.frame_ids)
    params, stats = init_mono_params(models, jax.random.PRNGKey(0), inputs)
    state = TrainState.create(params, stats, create_optimizer(1e-4, 15, 1000))
    step = make_mono_train_step(models)
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    float(jax.device_get(losses["loss"]))
    with jax.profiler.trace(tmpdir):
        for _ in range(n):
            rng, k = jax.random.split(rng)
            state, losses = step(state, batch, k)
        float(jax.device_get(losses["loss"]))
    return n


def aggregate(tmpdir, n_steps):
    paths = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", tmpdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid names containing "TPU" (xla ops run there)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, name in pid_names.items()
                if "TPU" in name or "/device:" in name}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0.0)
            cnt[e["name"]] += 1
    per_step = {k: v / 1000.0 / n_steps for k, v in tot.items()}
    total = sum(per_step.values())
    print(f"device tracks: {[pid_names[p] for p in dev_pids]}")
    print(f"total device op time: {total:.1f} ms/step over {n_steps} steps\n")
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms:8.3f} ms  x{cnt[name]//n_steps:<4d} {name[:110]}")


def main():
    import tempfile

    tmpdir = os.environ.get("PROF_DIR") or tempfile.mkdtemp(prefix="ssde_prof_")
    n = run_and_trace(tmpdir)
    aggregate(tmpdir, n)


if __name__ == "__main__":
    main()
