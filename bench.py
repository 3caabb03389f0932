#!/usr/bin/env python
"""Benchmark: KITTI 640x192 self-supervised training samples/sec on one chip.

Runs the full jitted monodepth2-style train step (encoder + depth + pose
forward, warp, min-reprojection loss, backward, Adam) in bfloat16 on
synthetic device-resident data, and prints ONE JSON line.

``vs_baseline``: the north star is >=5000 samples/s on a v5p-8
(BASELINE.json), i.e. 625 samples/s/chip; we report our per-chip
throughput relative to that share.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# bf16 peak of one TPU v5e chip (the axon "TPU v5 lite" bench target);
# override with BENCH_PEAK_TFLOPS for other parts
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def _step_flops(step, state, batch, rng):
    """HLO flop count of the compiled train step (jax cost analysis).

    This is the flops XLA actually schedules (including any remat
    recompute), so flops/dt/peak is a true MFU for the compiled program.
    """
    try:
        compiled = step.lower(state, batch, rng).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _bench_gru(results):
    """Flagship GRU sequence step (BASELINE config #4 shape) — records
    frame-samples/s for v10 (perf default) and v9 (attention fusion) in
    the same driver-visible artifact (round-3 verdict item 2)."""
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

    H, W = 192, 640
    n_steps = int(os.environ.get("BENCH_GRU_STEPS", "8"))
    # (version, B, T, result key). T=10 is the reference's default
    # --len_sequence (options.py:54-57): the scan/remat design's real
    # stress test — recorded next to the T=3 numbers (round-4 verdict).
    configs = [
        ("v10", 8, 3, "gru_v10_frame_samples_per_sec"),
        ("v9", 8, 3, "gru_v9_frame_samples_per_sec"),
        ("v10", 4, 10, "gru_v10_T10_frame_samples_per_sec"),
    ]
    if os.environ.get("BENCH_GRU_T10", "1") == "0":
        configs = configs[:2]
    for version, B, T, key in configs:
        opts = Options(height=H, width=W, batch_size=B, len_sequence=T,
                       num_layers=18, compute_dtype="bfloat16",
                       gru_version=version, scales=[0, 1, 2, 3])
        ds = SyntheticSeqDataset(H, W, n=T, length=B)
        batch = collate([ds[i] for i in range(B)])
        batch = jax.tree.map(jax.device_put, batch)
        models = build_gru_models(opts)
        params, stats = init_gru_params(models, jax.random.PRNGKey(0), batch)
        state = TrainState.create(params, stats, create_optimizer(1e-4, 0, 10))
        step = make_gru_train_step(models)
        rng = jax.random.PRNGKey(0)
        try:
            for _ in range(2):
                rng, k = jax.random.split(rng)
                state, losses = step(state, batch, k)
            float(jax.device_get(losses["loss"]))
            t0 = time.perf_counter()
            for _ in range(n_steps):
                rng, k = jax.random.split(rng)
                state, losses = step(state, batch, k)
            float(jax.device_get(losses["loss"]))
            dt = time.perf_counter() - t0
            results[key] = round(B * T * n_steps / dt, 2)
        except Exception as e:  # record OOM/compile failures per config
            results[key + "_error"] = str(e)[:120]
        del state, batch, params, stats


def _bench_hires(results):
    """BASELINE config #5 resolution (1024x320 mono) — one line in the
    driver artifact so the hi-res config is no longer dark (round-4
    verdict item 8)."""
    import jax

    from ssde_tpu.config import Options
    from ssde_tpu.data import make_synthetic_batch
    from ssde_tpu.train import (
        TrainState,
        build_mono_models,
        create_optimizer,
        init_mono_params,
        make_mono_train_step,
    )
    from ssde_tpu.data.transforms import preprocess_batch

    B = int(os.environ.get("BENCH_HIRES_BATCH", "12"))
    n_steps = int(os.environ.get("BENCH_HIRES_STEPS", "8"))
    opts = Options(height=320, width=1024, batch_size=B, num_layers=18,
                   compute_dtype="bfloat16", frame_ids=[0, -1, 1],
                   scales=[0, 1, 2, 3])
    models = build_mono_models(opts)
    batch = make_synthetic_batch(B, opts.height, opts.width)
    batch = jax.tree.map(jax.device_put, batch)
    inputs = preprocess_batch(batch, opts.height, opts.width,
                              opts.num_scales, opts.frame_ids)
    params, stats = init_mono_params(models, jax.random.PRNGKey(0), inputs)
    state = TrainState.create(params, stats, create_optimizer(1e-4, 15, 1000))
    step = make_mono_train_step(models)
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    float(jax.device_get(losses["loss"]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    float(jax.device_get(losses["loss"]))
    dt = time.perf_counter() - t0
    results["hires_1024x320_samples_per_sec"] = round(B * n_steps / dt, 2)


def main():
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

    batch_size = int(os.environ.get("BENCH_BATCH", "48"))
    opts = Options(
        height=192, width=640, batch_size=batch_size, num_layers=18,
        compute_dtype="bfloat16", frame_ids=[0, -1, 1], scales=[0, 1, 2, 3],
    )
    models = build_mono_models(opts)
    batch = make_synthetic_batch(batch_size, opts.height, opts.width)
    batch = jax.tree.map(jax.device_put, batch)
    inputs = preprocess_batch(batch, opts.height, opts.width, opts.num_scales,
                              opts.frame_ids)
    params, batch_stats = init_mono_params(models, jax.random.PRNGKey(0), inputs)
    tx = create_optimizer(1e-4, 15, 1000)
    state = TrainState.create(params, batch_stats, tx)

    step = make_mono_train_step(models)
    rng = jax.random.PRNGKey(0)

    # warmup / compile. NOTE: on the tunneled TPU, block_until_ready can
    # return before execution finishes (PLAN.md); a host readback of the
    # LAST loss — which data-depends on every prior step through the
    # state chain — cannot.
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, losses = step(state, batch, k)
    float(jax.device_get(losses["loss"]))

    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    def timed_chain(state, rng):
        t0 = time.perf_counter()
        losses = None
        for _ in range(n_steps):
            rng, k = jax.random.split(rng)
            state, losses = step(state, batch, k)
        float(jax.device_get(losses["loss"]))
        return state, rng, time.perf_counter() - t0

    state, rng, dt = timed_chain(state, rng)
    samples_per_sec = batch_size * n_steps / dt
    if samples_per_sec > 1500.0:
        # >2x the full v5p-8 north star on ONE chip = a measurement
        # glitch (observed once: 14788 samples/s when the tunnel released
        # a wait early); re-measure and keep the slower, believable run
        state, rng, dt2 = timed_chain(state, rng)
        dt = max(dt, dt2)
        samples_per_sec = batch_size * n_steps / dt
    per_chip_target = 5000.0 / 8.0  # v5p-8 north star, per chip
    result = {
        "metric": "kitti_640x192_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / per_chip_target, 4),
        "batch": batch_size,
    }

    # roofline grounding: HLO flops of the compiled step / wall / peak.
    # Named hlo_flops_util, not "MFU": cost_analysis counts ALL HLO flops
    # (VPU/elementwise + remat recompute), so dividing by the chip's
    # matmul peak is an UPPER bound on matmul-only MFU as conventionally
    # defined — keep cross-framework comparisons apples-to-apples.
    flops = _step_flops(step, state, batch, rng)
    if flops:
        result["step_tflops"] = round(flops / 1e12, 3)
        result["hlo_flops_util"] = round(
            (flops * n_steps / dt) / (PEAK_TFLOPS * 1e12), 4)

    if os.environ.get("BENCH_GRU", "1") != "0":
        try:
            _bench_gru(result)
        except Exception as e:  # GRU bench must never break the main line
            result["gru_error"] = str(e)[:120]

    if os.environ.get("BENCH_HIRES", "1") != "0":
        try:
            _bench_hires(result)
        except Exception as e:
            result["hires_error"] = str(e)[:120]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
