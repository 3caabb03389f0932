#!/usr/bin/env python
"""Standalone chained-difference timing of the banded warp family.

Times fwd and fwd+bwd of grid_sample_banded on the bench family shapes
(B=48, S=4 scales, one source; the train step runs two of these), using
the PLAN.md chained-scan recipe: data-dependent lax.scan chains of two
lengths, report (t_long - t_short) / (n_long - n_short).

Usage: BENCH_BATCH=48 python scripts/microbench_warp.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_time(fn, args, n_short=5, n_long=25):
    """Median-of-3 chained per-iteration time in ms."""

    def run(n):
        @jax.jit
        def chained(*a):
            def body(c, _):
                out = fn(*c[1:], salt=c[0])
                return (out, *c[1:]), ()

            (carry, *_), _ = jax.lax.scan(body, (jnp.float32(0), *a), None,
                                          length=n)
            return carry

        r = chained(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = chained(*args)
        float(jnp.sum(r))  # force device->host
        return time.perf_counter() - t0

    ts = []
    for _ in range(3):
        t_s = run(n_short)
        t_l = run(n_long)
        ts.append((t_l - t_s) / (n_long - n_short) * 1000)
    ts.sort()
    return ts[1]


def main():
    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from ssde_tpu.ops.pallas.warp_banded import grid_sample_banded

    B = int(os.environ.get("BENCH_BATCH", "48"))
    S, H, W, C = 4, 192, 640, 3
    vband = int(os.environ.get("WARP_VBAND", "8"))
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (B, H, W, C), jnp.float32)
    # near-identity grids with small smooth offsets (KITTI-like spans)
    ys, xs = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                          indexing="ij")
    base = jnp.stack([xs, ys], -1)
    offs = 0.004 * jax.random.normal(key, (B, S, 1, 1, 2))
    grids = base[None, None] + offs

    def fwd(img, grids, salt=0.0):
        out = grid_sample_banded(img + salt * 1e-20, grids, False, 8, False,
                                 False, vband)
        return jnp.sum(out) * 0 + salt + jnp.sum(out)

    def fwdbwd(img, grids, salt=0.0):
        def loss(g):
            out = grid_sample_banded(img + salt * 1e-20, g, False, 8, False,
                                     False, vband)
            return jnp.sum(out * out)

        l, dg = jax.value_and_grad(loss)(grids)
        return l + jnp.sum(dg) * 1e-9 + salt

    t_f = chain_time(lambda i, g, salt: fwd(i, g, salt), (img, grids))
    t_fb = chain_time(lambda i, g, salt: fwdbwd(i, g, salt), (img, grids))
    print(json.dumps({"B": B, "vband": vband, "fwd_ms": round(t_f, 2),
                      "fwdbwd_ms": round(t_fb, 2)}))


if __name__ == "__main__":
    main()
