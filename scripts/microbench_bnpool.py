#!/usr/bin/env python
"""Microbench: BN+ReLU and maxpool fwd+bwd costs at the encoder's hot shapes.

Grounds the round-5 fused-epilogue campaign: how much of the step do the
non-conv pieces of the ResNet stages actually cost under XLA, measured with
the chained-difference recipe (PLAN.md: block_until_ready is unreliable on
the tunneled axon TPU; time a data-dependent lax.scan chain and subtract
two chain lengths so dispatch bias cancels).

Usage: python scripts/microbench_bnpool.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from ssde_tpu.utils import enable_compile_cache

enable_compile_cache()


def timed(fn, args, n1=20, n2=420):
    """Chained-difference timing of fn(*args) -> scalar-reducible pytree.

    Long chains (n2 - n1 = 400) so the measured difference is seconds —
    the tunneled TPU's RPC jitter is O(100 ms) per dispatch and swamps
    short chains. Two rounds, keep the smaller difference."""

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def chain(n, c0):
        def body(carry, _):
            out = fn(*args, carry)
            return out, ()

        return lax.scan(body, c0, (), length=n)[0]

    def once(n):
        c = chain(n, jnp.float32(0.0))
        float(jax.device_get(c))
        t0 = time.perf_counter()
        c = chain(n, jnp.float32(0.0))
        float(jax.device_get(c))
        return time.perf_counter() - t0

    once(n1), once(n2)  # compile both
    diffs = []
    for _ in range(2):
        t1 = once(n1)
        t2 = once(n2)
        diffs.append((t2 - t1) / (n2 - n1) * 1e3)
    return min(diffs)


def vjp_scalar(f, *xs):
    """Build fn(carry) that runs f(*xs) fwd+bwd, perturbed by carry so
    the chain is data-dependent and nothing hoists."""

    def g(carry):
        xs_p = [x + carry.astype(x.dtype) * 1e-6 for x in xs]
        y, vjp = jax.vjp(lambda *a: jnp.sum(f(*a).astype(jnp.float32)), *xs_p)
        dx = vjp(jnp.float32(1.0))
        return y * 1e-12 + sum(jnp.sum(d.astype(jnp.float32)) * 1e-12 for d in dx) + carry

    return g


def bn_relu(x, scale, bias):
    m = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2)) - m * m
    y = (x.astype(jnp.float32) - m) * lax.rsqrt(v + 1e-5) * scale + bias
    return jax.nn.relu(y).astype(x.dtype)


def main():
    B = int(os.environ.get("BENCH_BATCH", "48"))
    key = jax.random.PRNGKey(0)
    shapes = [
        ("stem 96x320x64", (B, 96, 320, 64)),
        ("l1 48x160x64", (B, 48, 160, 64)),
        ("l2 24x80x128", (B, 24, 80, 128)),
        ("l3 12x40x256", (B, 12, 40, 256)),
    ]
    class _Results(dict):
        def __setitem__(self, k, v):  # stream results as they land
            print(f"{k:32s} {v:8.3f} ms", flush=True)
            super().__setitem__(k, v)

    results = _Results()

    probes = os.environ.get("BENCH_PROBES", "pool,bn,conv").split(",")

    # --- maxpool 3x3 s2 (stem shape only: that's where it runs)
    if "pool" in probes:
        from ssde_tpu.models.resnet import max_pool_3x3_s2
        from ssde_tpu.ops.pool import max_pool_3x3_s2_fast

        x = jax.nn.relu(
            jax.random.normal(key, (B, 96, 320, 64), jnp.bfloat16))
        results["maxpool fwd+bwd"] = timed(vjp_scalar(max_pool_3x3_s2, x), ())
        results["maxpool_fast fwd+bwd"] = timed(
            vjp_scalar(max_pool_3x3_s2_fast, x), ())

    # --- bn+relu per shape
    for name, shp in (shapes if "bn" in probes else []):
        x = jax.random.normal(key, shp, jnp.bfloat16)
        s = jnp.ones((shp[-1],), jnp.float32)
        b = jnp.zeros((shp[-1],), jnp.float32)
        results[f"bn_relu {name}"] = timed(vjp_scalar(bn_relu, x, s, b), ())

    # --- conv3x3 alone vs conv3x3+bn+relu (the fusion gap per conv)
    for name, shp in (shapes[1:3] if "conv" in probes else []):
        C = shp[-1]
        x = jax.random.normal(key, shp, jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        s = jnp.ones((C,), jnp.float32)
        bb = jnp.zeros((C,), jnp.float32)

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def conv_bn(x, w, s, bb):
            return bn_relu(conv(x, w), s, bb)

        results[f"conv {name}"] = timed(vjp_scalar(conv, x, w), ())
        results[f"conv+bn+relu {name}"] = timed(vjp_scalar(conv_bn, x, w, s, bb), ())

    print("done")


if __name__ == "__main__":
    main()
