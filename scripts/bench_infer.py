#!/usr/bin/env python
"""Inference benchmark: KITTI 640x192 depth frames/sec on one chip.

The BASELINE.md third target ("KITTI 640x192 depth frames/sec/chip") is
the deploy path of reference test_simple.py:94-123 / evaluate_depth.py:
87-135 — encoder + depth decoder forward, disp at scale 0. Runs bf16 on
synthetic device-resident frames and prints one JSON line.

Timing uses the chained-difference method (PLAN.md round-3 harness note):
on the tunneled TPU ``block_until_ready`` can return before execution
finishes, so the forward is scanned data-dependently and two chain
lengths are differenced to cancel dispatch overhead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from ssde_tpu.models import DepthDecoder, ResnetEncoder

    B = int(os.environ.get("BENCH_BATCH", "32"))
    H, W = 192, 640
    num_layers = int(os.environ.get("BENCH_LAYERS", "18"))
    dt = jnp.bfloat16

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(dt)

    enc = ResnetEncoder(num_layers, dtype=dt)
    ev = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(ev, x, False)
    dec = DepthDecoder(scales=(0,), dtype=dt)
    dv = dec.init(jax.random.PRNGKey(1), feats)

    def forward(x):
        feats = enc.apply(ev, x, False)
        return dec.apply(dv, feats)["disp/0"]

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def chain(x, n):
        def body(carry, _):
            d = forward(x + carry.astype(dt) * 1e-9)
            return jnp.mean(d.astype(jnp.float32)), None

        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    def run(n):
        return chain(x, n)

    float(run(5)); float(run(25))  # compile both
    t0 = time.perf_counter(); float(run(5)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(25)); t2 = time.perf_counter() - t0
    per_step = (t2 - t1) / 20.0
    fps = B / per_step

    print(json.dumps({
        "metric": "kitti_640x192_depth_infer_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "batch": B,
        "ms_per_batch": round(per_step * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
