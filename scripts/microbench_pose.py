#!/usr/bin/env python
"""Decompose the pose slice (39.7 ms of the 173.6 ms B=48 step).

Parts, each timed fwd+bwd (params-grad only, like the real step) with the
chained-difference recipe (PLAN.md timing notes):
  concat      build the (2B, H, W, 6) pair stack from 3 frames
  stem        pose conv1 7x7/s2 (6ch) + BN + relu
  encoder     full pose ResnetEncoder pass on the pair stack
  decoder     PoseDecoder on encoder features
  full        encoder + decoder + transformation_from_parameters

Usage: BENCH_BATCH=48 python scripts/microbench_pose.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timed(apply_fn, params, x, label):
    @functools.partial(jax.jit, static_argnums=0)
    def chain(n, params, x):
        def body(c, _):
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

    float(chain(5, params, x))
    float(chain(25, params, x))
    t0 = time.perf_counter()
    float(chain(5, params, x))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(25, params, x))
    t2 = time.perf_counter() - t0
    ms = (t2 - t1) / 20 * 1e3
    print(f"{label:>10}: {ms:7.2f} ms fwd+bwd")
    return ms


def main():
    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from ssde_tpu.models import PoseDecoder, ResnetEncoder
    from ssde_tpu.ops import transformation_from_parameters

    B = int(os.environ.get("BENCH_BATCH", "48"))
    H, W = 192, 640
    dt = jnp.bfloat16
    enc = ResnetEncoder(18, num_input_images=2, dtype=dt)
    dec = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2,
                      dtype=dt)

    rng = jax.random.PRNGKey(0)
    frames = jax.random.uniform(rng, (3, B, H, W, 3), jnp.float32)
    pair = jnp.concatenate([frames[0], frames[1]], axis=-1)
    pairs2 = jnp.concatenate(
        [jnp.concatenate([frames[0], frames[1]], axis=-1),
         jnp.concatenate([frames[1], frames[2]], axis=-1)], axis=0)

    venc = enc.init(jax.random.PRNGKey(1), pair, True)
    feats = enc.apply(venc, pair, False)
    vdec = dec.init(jax.random.PRNGKey(2), [feats])

    # concat cost: fwd only (no params) — time the stack build alone
    @jax.jit
    def concat_only(x):
        a = jnp.concatenate([x[0], x[1]], axis=-1)
        b = jnp.concatenate([x[1], x[2]], axis=-1)
        return jnp.concatenate([a, b], axis=0)

    @functools.partial(jax.jit, static_argnums=0)
    def cchain(n, x):
        def body(c, _):
            y = concat_only(x * (1 + c * 1e-9))
            return c + jnp.mean(y.astype(jnp.float32)), None
        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    float(cchain(5, frames)); float(cchain(25, frames))
    t0 = time.perf_counter(); float(cchain(5, frames)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(cchain(25, frames)); t2 = time.perf_counter() - t0
    print(f"{'concat':>10}: {(t2 - t1) / 20 * 1e3:7.2f} ms fwd")

    # stem only
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = (x - 0.45) / 0.225
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        dtype=dt, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=dt, name="bn")(x)
            return nn.relu(x)

    stem = Stem()
    vstem = stem.init(jax.random.PRNGKey(3), pairs2)
    timed(lambda p, x: stem.apply({"params": p}, x,
                                  mutable=["batch_stats"])[0],
          vstem["params"], pairs2, "stem")

    timed(lambda p, x: enc.apply({"params": p,
                                  "batch_stats": venc.get("batch_stats", {})},
                                 x, True, mutable=["batch_stats"])[0],
          venc["params"], pairs2, "encoder")

    timed(lambda p, f: dec.apply({"params": p}, [f]), vdec["params"],
          feats, "decoder")

    def full(p, x):
        f = enc.apply({"params": p["enc"],
                       "batch_stats": venc.get("batch_stats", {})},
                      x, True, mutable=["batch_stats"])[0]
        aa, t = dec.apply({"params": p["dec"]}, [f])
        T1 = transformation_from_parameters(
            aa[:B, 0].astype(jnp.float32), t[:B, 0].astype(jnp.float32), True)
        T2 = transformation_from_parameters(
            aa[B:, 0].astype(jnp.float32), t[B:, 0].astype(jnp.float32), False)
        return T1, T2

    timed(full, {"enc": venc["params"], "dec": vdec["params"]}, pairs2,
          "full")


if __name__ == "__main__":
    main()
