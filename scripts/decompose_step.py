#!/usr/bin/env python
"""Chained-ablation decomposition of the mono train step on the real chip.

Measures bench-style chained throughput for progressively larger slices of
the step (encoder+decoder -> +pose -> +warp -> +loss); differences between
consecutive variants give each slice's fwd+bwd cost including its backward
and the shared Adam update. Chaining through the optimizer state keeps every
step data-dependent (see PLAN.md timing notes: block_until_ready alone is
unreliable on the tunneled axon TPU).

Usage: BENCH_BATCH=48 python scripts/decompose_step.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from ssde_tpu.config import Options
    from ssde_tpu.data import make_synthetic_batch
    from ssde_tpu.data.transforms import preprocess_batch
    from ssde_tpu.train import (
        TrainState, build_mono_models, create_optimizer, init_mono_params,
    )
    from ssde_tpu.train.steps import (
        _apply_bn, compute_losses, generate_images_pred, predict_poses,
    )

    B = int(os.environ.get("BENCH_BATCH", "48"))
    opts = Options(
        height=192, width=640, batch_size=B, num_layers=18,
        compute_dtype="bfloat16", frame_ids=[0, -1, 1], scales=[0, 1, 2, 3],
    )
    models = build_mono_models(opts)
    batch = make_synthetic_batch(B, opts.height, opts.width)
    batch = jax.tree.map(jax.device_put, batch)
    sample = preprocess_batch(batch, opts.height, opts.width, opts.num_scales,
                              opts.frame_ids)
    params, batch_stats = init_mono_params(models, jax.random.PRNGKey(0), sample)
    tx = create_optimizer(1e-4, 15, 1000)

    dtype = jnp.bfloat16

    def ablated_loss(params, batch_stats, inputs, rng, level):
        new_bs = dict(batch_stats)
        x0 = inputs["color_aug/0/0"].astype(dtype)
        feats, bs = _apply_bn(models.encoder, params["encoder"],
                              batch_stats.get("encoder", {}), x0, train=True)
        new_bs["encoder"] = bs
        outputs = models.depth.apply({"params": params["depth"]}, feats)
        if level == "encdec":
            loss = sum(jnp.mean(outputs[f"disp/{s}"].astype(jnp.float32))
                       for s in opts.scales)
            return loss, (new_bs, {"loss": loss})
        pose_out, pose_bs = predict_poses(models, params, batch_stats, inputs,
                                          True)
        outputs.update(pose_out)
        new_bs.update(pose_bs)
        if level == "models":
            loss = sum(jnp.mean(outputs[f"disp/{s}"].astype(jnp.float32))
                       for s in opts.scales)
            loss = loss + sum(
                jnp.mean(outputs[f"cam_T_cam/0/{f}"][:, :3, 3] ** 2)
                for f in (-1, 1))
            return loss, (new_bs, {"loss": loss})
        outputs = generate_images_pred(inputs, outputs, opts, models.source_ids)
        if level == "no_loss":
            loss = sum(jnp.mean(outputs[f"color/{f}/{s}"].astype(jnp.float32))
                       for s in opts.scales for f in (-1, 1))
            loss = loss + sum(jnp.mean(outputs[f"disp/{s}"].astype(jnp.float32))
                              for s in opts.scales)
            return loss, (new_bs, {"loss": loss})
        losses = compute_losses(inputs, outputs, opts, models.source_ids, rng)
        return losses["loss"], (new_bs, losses)

    def make_step(level):
        def step(state, batch, rng):
            inputs = preprocess_batch(
                batch, opts.height, opts.width, opts.num_scales,
                list(opts.frame_ids), is_train=True,
                pyramid_frames=None if opts.v1_multiscale else [0],
                aug_num_scales=None if opts.v1_multiscale else 1,
            )

            def loss_fn(p):
                return ablated_loss(p, state.batch_stats, inputs, rng, level)

            grads, (new_bs, losses) = jax.grad(loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads, new_batch_stats=new_bs), losses

        # NOT donated: fused raveled Adam + donation trips the axon runtime
        return jax.jit(step)

    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    results = {}
    for level in ("encdec", "models", "no_loss", "full"):
        # fresh device copies: each variant's jit donates its state
        state = TrainState.create(jax.tree.map(jnp.copy, params),
                                  jax.tree.map(jnp.copy, batch_stats), tx)
        step = make_step(level)
        rng = jax.random.PRNGKey(0)
        for _ in range(3):
            rng, k = jax.random.split(rng)
            state, losses = step(state, batch, k)
        jax.block_until_ready(losses["loss"])
        t0 = time.perf_counter()
        for _ in range(n_steps):
            rng, k = jax.random.split(rng)
            state, losses = step(state, batch, k)
        jax.block_until_ready(losses["loss"])
        ms = (time.perf_counter() - t0) / n_steps * 1000
        results[level] = ms
        print(f"{level:10s} {ms:8.2f} ms/step  ({B / ms * 1000:7.1f} samples/s)",
              flush=True)

    print(json.dumps({
        "B": B,
        "encdec_ms": round(results["encdec"], 2),
        "pose_ms": round(results["models"] - results["encdec"], 2),
        "warp_ms": round(results["no_loss"] - results["models"], 2),
        "loss_ms": round(results["full"] - results["no_loss"], 2),
        "full_ms": round(results["full"], 2),
    }))


if __name__ == "__main__":
    main()
