#!/usr/bin/env python
"""Micro-profiling of train-step components on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=10):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    from ssde_tpu.config import Options
    from ssde_tpu.data import make_synthetic_batch
    from ssde_tpu.data.transforms import preprocess_batch, color_jitter
    from ssde_tpu.ops import grid_sample, reproject_coords, resize_bilinear
    from ssde_tpu.ops.losses import photometric_loss, reprojection_loss, smooth_loss
    from ssde_tpu.train.steps import (
        build_mono_models, init_mono_params, mono_loss_fn, predict_poses,
        _apply_bn,
    )

    B = int(os.environ.get("PROF_BATCH", "16"))
    H, W = 192, 640
    opts = Options(height=H, width=W, batch_size=B, compute_dtype="bfloat16",
                   frame_ids=[0, -1, 1])
    models = build_mono_models(opts)
    batch = make_synthetic_batch(B, H, W)
    batch = jax.tree.map(jax.device_put, batch)
    inputs = preprocess_batch(batch, H, W, 4, [0, -1, 1])
    inputs = jax.tree.map(jax.device_put, inputs)
    params, batch_stats = init_mono_params(models, jax.random.PRNGKey(0), inputs)

    key = jax.random.PRNGKey(0)

    # components
    timeit("preprocess_batch", jax.jit(
        lambda b: preprocess_batch(b, H, W, 4, [0, -1, 1])), batch)

    x0 = inputs["color_aug/0/0"].astype(jnp.bfloat16)

    @jax.jit
    def enc_fwd(p, x):
        feats, _ = _apply_bn(models.encoder, p["encoder"],
                             batch_stats["encoder"], x, train=True)
        return models.depth.apply({"params": p["depth"]}, feats)

    timeit("encoder+decoder fwd", enc_fwd, params, x0)

    @jax.jit
    def pose_fwd(p):
        out, _ = predict_poses(models, p, batch_stats, inputs, True)
        return out["cam_T_cam/0/1"]

    timeit("pose fwd (2 frames)", pose_fwd, params)

    img = inputs["color/0/0"]
    depth = jnp.ones((B, H, W, 1))
    K = inputs["K/0"]
    invK = inputs["inv_K/0"]
    T = jnp.tile(jnp.eye(4)[None], (B, 1, 1))

    @jax.jit
    def warp_once(img, depth):
        pix = reproject_coords(depth, invK, K, T)
        return grid_sample(img, pix)

    t_warp = timeit("reproject+grid_sample (1 scale)", warp_once, img, depth)

    @jax.jit
    def gs_only(img, pix):
        return grid_sample(img, pix)

    pix = jax.jit(lambda d: reproject_coords(d, invK, K, T))(depth)
    timeit("grid_sample alone", gs_only, img, pix)

    @jax.jit
    def reproj_loss(a, b):
        return reprojection_loss(a, b)

    timeit("reprojection_loss (ssim+l1)", reproj_loss, img, img * 0.9)

    @jax.jit
    def full_loss(p, k):
        return mono_loss_fn(models, p, batch_stats, inputs, k)[0]

    timeit("full fwd loss", full_loss, params, key)

    @jax.jit
    def full_grad(p, k):
        return jax.grad(lambda pp: mono_loss_fn(models, pp, batch_stats,
                                                inputs, k)[0])(p)

    timeit("full fwd+bwd", full_grad, params, key)

    @jax.jit
    def jit_jitter(x, f):
        return color_jitter(x, f)

    timeit("color_jitter", jit_jitter, inputs["color/0/0"],
           jnp.ones((B, 4)))


if __name__ == "__main__":
    main()
