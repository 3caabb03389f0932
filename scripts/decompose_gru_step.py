#!/usr/bin/env python
"""Chained-ablation decomposition of the GRU sequence train step.

Same methodology as decompose_step.py (progressively larger slices, each
jitted with donated state so steps chain data-dependently): encoder+
decoder over B*T frames -> +gru scan -> +pose -> +warp -> +loss.
Differences between consecutive variants give each slice's fwd+bwd cost.

Usage: BENCH_BATCH=8 BENCH_T=3 BENCH_GRU_VERSION=v10 python scripts/decompose_gru_step.py
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
    from ssde_tpu.data.pipeline import collate
    from ssde_tpu.data.synthetic import SyntheticSeqDataset
    from ssde_tpu.train.state import TrainState, create_optimizer
    from ssde_tpu.train.steps import (
        _apply_bn, compute_losses, generate_images_pred, predict_poses,
    )
    from ssde_tpu.train.steps_gru import (
        PRE_DISP_VERSIONS,
        _maybe_remat,
        build_gru_models,
        gru_unroll,
        init_gru_params,
        preprocess_gru_batch,
    )

    B = int(os.environ.get("BENCH_BATCH", "8"))
    T = int(os.environ.get("BENCH_T", "3"))
    version = os.environ.get("BENCH_GRU_VERSION", "v10")
    H, W = 192, 640
    opts = Options(height=H, width=W, batch_size=B, len_sequence=T,
                   num_layers=18, compute_dtype="bfloat16",
                   gru_version=version, scales=[0, 1, 2, 3])
    models = build_gru_models(opts)
    ds = SyntheticSeqDataset(H, W, n=T, length=B)
    batch = collate([ds[i] for i in range(B)])
    batch = jax.tree.map(jax.device_put, batch)
    params, batch_stats = init_gru_params(models, jax.random.PRNGKey(0), batch)
    tx = create_optimizer(1e-4, 0, 10)
    dtype = jnp.bfloat16

    def ablated_loss(params, batch_stats, inputs, rng, level, B, T):
        new_bs = dict(batch_stats)
        x = inputs["color_aug/0/0"].astype(dtype)

        def enc_fn(p, bs_in, xx):
            return _apply_bn(models.encoder, p, bs_in, xx, train=True)

        feats, bs = _maybe_remat(enc_fn, opts)(
            params["encoder"], batch_stats.get("encoder", {}), x)
        new_bs["encoder"] = bs
        pre_disp = version in PRE_DISP_VERSIONS and bool(opts.gru_pre_disp)

        def dec_fn(p, fs):
            return models.depth.apply({"params": p}, fs, pre_disp=pre_disp)

        dec = _maybe_remat(dec_fn, opts)(params["depth"], feats)
        if level == "encdec":
            loss = sum(jnp.mean(v.astype(jnp.float32)) for v in dec.values())
            return loss, (new_bs, {"loss": loss})
        # like gru_loss_fn: attention softmax residuals must be transient
        # (the auto remat policy relies on it)
        from ssde_tpu.models.attention import remat_attention

        with remat_attention():
            outputs = gru_unroll(models, params, dec, B, T)
        if level == "gru":
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
            inputs, b, t = preprocess_gru_batch(batch, opts, is_train=True)

            def loss_fn(p):
                return ablated_loss(p, state.batch_stats, inputs, rng, level,
                                    b, t)

            grads, (new_bs, losses) = jax.grad(loss_fn, has_aux=True)(
                state.params)
            return state.apply_gradients(grads, new_batch_stats=new_bs), losses

        # NOT donated: fused raveled Adam + donation trips the axon runtime
        return jax.jit(step)

    n_steps = int(os.environ.get("BENCH_STEPS", "15"))
    results = {}
    for level in ("encdec", "gru", "models", "no_loss", "full"):
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
        print(f"{level:10s} {ms:8.2f} ms/step  "
              f"({B * T / ms * 1000:7.1f} frame-samples/s)", flush=True)

    print(json.dumps({
        "B": B, "T": T, "version": version,
        "encdec_ms": round(results["encdec"], 2),
        "gru_ms": round(results["gru"] - results["encdec"], 2),
        "pose_ms": round(results["models"] - results["gru"], 2),
        "warp_ms": round(results["no_loss"] - results["models"], 2),
        "loss_ms": round(results["full"] - results["no_loss"], 2),
        "full_ms": round(results["full"], 2),
    }))


if __name__ == "__main__":
    main()
