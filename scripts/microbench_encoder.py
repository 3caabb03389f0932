#!/usr/bin/env python
"""Microbench the encoder/decoder parts (fwd+bwd) with chained steps.

Times, per part, a jitted grad step whose loss depends on the part's
output so every iteration is data-dependent (PLAN.md timing notes):
  stem     conv1 7x7/s2 + BN + relu                  (B,192,640,C_in)
  stem_s2d the same contraction as a 4x4 conv on a space-to-depth
           input (B,96,320,4*C_in) — the candidate MXU-friendly rewrite
  stages   layer1-4 from the maxpooled stem output
  decoder  depth decoder from encoder features
  pose_stem conv1 on 6-channel input at 2B (the pose encoder's shape)

Usage: BENCH_BATCH=48 python scripts/microbench_encoder.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn


import functools

from jax import lax


def timed(apply_fn, params, x):
    """Chained-difference fwd+bwd timing: (t25 - t5) / 20 (PLAN.md notes —
    block_until_ready can return early on the tunneled axon TPU; chain the
    op data-dependently through lax.scan and force a device->host read)."""

    @functools.partial(jax.jit, static_argnums=0)
    def chain(n, params, x):
        def body(c, _):
            # scale both params and x by the carry so nothing is
            # loop-invariant; grads wrt params only (like the real step,
            # where the image input is a leaf)
            sx = jax.tree.map(lambda t: t * (1 + c * 1e-9).astype(t.dtype), x)

            def loss(p):
                y = apply_fn(p, sx)
                return sum(jnp.mean(t.astype(jnp.float32))
                           for t in jax.tree.leaves(y))

            sp = jax.tree.map(lambda t: t * (1 + c * 1e-9).astype(t.dtype),
                              params)
            v, g = jax.value_and_grad(loss)(sp)
            return v + sum(jnp.mean(t.astype(jnp.float32))
                           for t in jax.tree.leaves(g)), None

        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    # chain lengths sized for the tunnel's O(100 ms) RPC jitter (round-5
    # note, PLAN.md): the measured difference must be seconds
    n1, n2 = 20, int(os.environ.get("BENCH_CHAIN", "220"))
    float(chain(n1, params, x)); float(chain(n2, params, x))
    diffs = []
    for _ in range(2):
        t0 = time.perf_counter(); float(chain(n1, params, x)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chain(n2, params, x)); t2 = time.perf_counter() - t0
        diffs.append((t2 - t1) / (n2 - n1) * 1e3)
    return min(diffs)


def main():
    from ssde_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from ssde_tpu.models.depth_decoder import DepthDecoder  # noqa: F401

    B = int(os.environ.get("BENCH_BATCH", "48"))
    H, W = 192, 640
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    results = {}

    def run(name, mod, x):
        v = mod.init(key, x)
        params = v["params"]
        rest = {k: vv for k, vv in v.items() if k != "params"}

        def apply_fn(p, xin):
            if "batch_stats" in rest:
                out, _ = mod.apply({"params": p, **rest}, xin,
                                   mutable=["batch_stats"])
                return out
            return mod.apply({"params": p, **rest}, xin)

        ms = timed(apply_fn, params, x)
        results[name] = round(ms, 2)
        print(f"{name:12s} {ms:8.2f} ms", flush=True)

    # --- stem: conv1 + BN(identity scale) + relu, fwd+bwd
    class Stem(nn.Module):
        c_in: int = 3

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        dtype=dtype, name="conv1")(x)
            return nn.relu(x)

    class StemS2D(nn.Module):
        """Same contraction shape as the s2d rewrite: 4x4 conv, 4*C_in ch."""
        c_in: int = 3

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (4, 4), (1, 1), padding=((2, 1), (2, 1)),
                        use_bias=False, dtype=dtype, name="conv1")(x)
            return nn.relu(x)

    rk = jax.random.PRNGKey(1)
    x_full = jax.random.normal(rk, (B, H, W, 3), dtype)
    x_s2d = jax.random.normal(rk, (B, H // 2, W // 2, 12), dtype)
    run("stem", Stem(), x_full)
    run("stem_s2d", StemS2D(), x_s2d)

    x_pose = jax.random.normal(rk, (2 * B, H, W, 6), dtype)
    x_pose_s2d = jax.random.normal(rk, (2 * B, H // 2, W // 2, 24), dtype)
    run("pose_stem", Stem(6), x_pose)
    run("pose_s2d", StemS2D(6), x_pose_s2d)

    # --- stages: layer1..4 from the maxpool output (eval- AND train-mode
    # BN: the real train step computes batch stats, which is a different
    # fusion story than running-stats normalize)
    class Stages(nn.Module):
        train: bool = False

        @nn.compact
        def __call__(self, x):
            # the encoder's stage stack from post-stem input, inline
            from ssde_tpu.models.resnet import BasicBlock
            feats = []
            planes = 64
            for stage_idx, n_blocks in enumerate([2, 2, 2, 2]):
                stride = 1 if stage_idx == 0 else 2
                for block_idx in range(n_blocks):
                    in_ch = x.shape[-1]
                    need_ds = block_idx == 0 and (stride != 1 or in_ch != planes)
                    x = BasicBlock(planes, stride=stride if block_idx == 0 else 1,
                                   downsample=need_ds, dtype=dtype,
                                   name=f"layer{stage_idx+1}_{block_idx}")(x, self.train)
                feats.append(x)
                planes *= 2
            return feats

    x_pooled = jax.random.normal(rk, (B, H // 4, W // 4, 64), dtype)
    run("stages", Stages(), x_pooled)
    run("stages_train", Stages(train=True), x_pooled)

    # --- decoder from real feature shapes
    enc_ch = [64, 64, 128, 256, 512]
    feats = [jax.random.normal(rk, (B, H // (2 ** (i + 1)), W // (2 ** (i + 1)), c), dtype)
             for i, c in enumerate(enc_ch)]

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, fs):
            return DepthDecoder(scales=(0, 1, 2, 3), dtype=dtype, name="d")(fs)

    run("decoder", Dec(), feats)

    print(json.dumps({"B": B, **results}))


if __name__ == "__main__":
    main()
