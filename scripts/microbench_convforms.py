#!/usr/bin/env python
"""Compare formulations of the decoder's hot 3x3 convs (fwd+bwd).

Per shape: NHWC XLA 3x3 vs the space-to-depth rewrite (2x2 conv on
(H/2, W/2, 4C) — same math, K 16C vs 9C, but N=4*Cout lanes). The s2d
form here is only shape-equivalent (random weights); exact weight
scatter comes later if the form wins.

Usage: BENCH_BATCH=48 python scripts/microbench_convforms.py
"""

import json
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timed(f, params, x):
    @functools.partial(jax.jit, static_argnums=0)
    def chain(n, params, x):
        def body(c, _):
            sx = jax.tree.map(lambda t: t * (1 + c * 1e-9).astype(t.dtype), x)

            def loss(p):
                y = f(p, sx)
                return jnp.mean(y.astype(jnp.float32))

            sp = jax.tree.map(lambda t: t * (1 + c * 1e-9).astype(t.dtype),
                              params)
            v, g = jax.value_and_grad(loss)(sp)
            return v + sum(jnp.mean(t.astype(jnp.float32))
                           for t in jax.tree.leaves(g)), None

        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    float(chain(5, params, x)); float(chain(25, params, x))
    t0 = time.perf_counter(); float(chain(5, params, x)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(25, params, x)); t2 = time.perf_counter() - t0
    return (t2 - t1) / 20.0 * 1e3


def main():
    from ssde_tpu.utils import enable_compile_cache
    enable_compile_cache()

    B = int(os.environ.get("BENCH_BATCH", "48"))
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    results = {}

    # decoder hot shapes: (H, W, Cin, Cout) of the two convs at each of
    # the three largest levels (post-upsample resolutions)
    shapes = [
        (192, 640, 16, 16),   # level 0 upconv_1 (+ dispconv-ish)
        (96, 320, 32, 32),    # level 1
        (96, 320, 32, 16),    # level 0 upconv_0
        (48, 160, 64, 64),    # level 2
    ]

    for (H, W, Ci, Co) in shapes:
        x = jax.random.normal(key, (B, H, W, Ci), dt)
        w = jax.random.normal(key, (3, 3, Ci, Co), jnp.float32) * 0.05

        def f_nhwc(p, xin):
            return lax.conv_general_dilated(
                xin, p.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ms = timed(f_nhwc, w, x)
        results[f"nhwc_{H}x{W}x{Ci}->{Co}"] = round(ms, 2)
        print(f"nhwc  {H:4d}x{W:4d} {Ci:3d}->{Co:3d} {ms:8.2f} ms", flush=True)

        xs = jax.random.normal(key, (B, H // 2, W // 2, 4 * Ci), dt)
        ws = jax.random.normal(key, (2, 2, 4 * Ci, 4 * Co), jnp.float32) * 0.05

        def f_s2d(p, xin):
            return lax.conv_general_dilated(
                xin, p.astype(dt), (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ms = timed(f_s2d, ws, xs)
        results[f"s2d_{H}x{W}x{Ci}->{Co}"] = round(ms, 2)
        print(f"s2d   {H:4d}x{W:4d} {Ci:3d}->{Co:3d} {ms:8.2f} ms", flush=True)

    print(json.dumps({"B": B, **results}))


if __name__ == "__main__":
    main()
