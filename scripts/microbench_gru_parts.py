#!/usr/bin/env python
"""Micro-bench the v10 GRU scan-body components (fwd+bwd, chained timing).

Times each per-scale component of the ConvGRUBlocks v10 step — the GRU
cells and the (attention-free) fusion blocks — individually at the
B=8 640x192 flagship shape, NHWC vs planar where a planar path exists.
Each sample is fwd + full backward (params AND inputs), chained
data-dependently (PLAN.md timing notes: block_until_ready alone is
unreliable on the tunneled axon TPU; use (t25 - t5) / 20).

Usage: python scripts/microbench_gru_parts.py [pattern]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(f, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def chain(n):
        def body(c, _):
            def loss(a):
                out = f(*a)
                return sum(jnp.mean(o.astype(jnp.float32))
                           for o in jax.tree.leaves(out))

            sa = jax.tree.map(
                lambda t: t * (1 + c * 1e-9).astype(t.dtype), args)
            v, g = jax.value_and_grad(loss)(sa)
            return v + sum(jnp.mean(t.astype(jnp.float32))
                           for t in jax.tree.leaves(g)), None

        return lax.scan(body, jnp.float32(0), None, length=n)[0]

    float(chain(5)); float(chain(25))
    t0 = time.perf_counter(); float(chain(5)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(25)); t2 = time.perf_counter() - t0
    return (t2 - t1) / 20.0 * 1e3


def main():
    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from ssde_tpu.models.fusion import GRUFusionBlock_v2
    from ssde_tpu.models.recurrent import ConvGRUCell

    B = int(os.environ.get("BENCH_BATCH", "8"))
    H, W = 192, 640
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    pattern = sys.argv[1] if len(sys.argv) > 1 else ""

    # v10 per-scale shapes: (H_s, W_s, x_ch, hid, fusion_feats)
    scales = [
        (192, 640, 32, 32, 32),
        (96, 320, 64, 64, 64),
        (48, 160, 128, 128, 128),
        (24, 80, 128, 256, 256),
    ]

    results = {}

    def run(name, f, *args):
        if pattern and pattern not in name:
            return
        ms = timed(f, *args)
        results[name] = round(ms, 2)
        print(f"{name:22s} {ms:8.2f} ms", flush=True)

    from ssde_tpu.ops.s2d import conv3x3_s2d, space_to_depth

    def cell_s2d(p, xs, hs, cx, hid):
        """Shape-exact s2d-view GRU cell: all tensors live in the group-
        major s2d view (B, Hs/2, Ws/2, 4C); zero-pad convs via
        conv3x3_s2d(reflect=False); gate math is layout-agnostic."""
        cp = p["params"]
        kg, bg = cp["conv_gates"]["kernel"], cp["conv_gates"]["bias"]
        kc, bc = cp["conv_can"]["kernel"], cp["conv_can"]["bias"]
        kx = jnp.concatenate([kg[:, :, :cx], kc[:, :, :cx]], axis=-1)
        bx = jnp.concatenate([bg, bc])
        B_, Hb, Wb, _ = xs.shape
        xsum = conv3x3_s2d(xs, kx.astype(dt), bx.astype(dt), reflect=False)
        hsum = conv3x3_s2d(hs, kg[:, :, cx:].astype(dt), reflect=False)
        # group-major channels: per-group slice needs the (4, 3*hid) view
        xsr = xsum.reshape(B_, Hb, Wb, 4, 3 * hid)
        gsum = xsr[..., : 2 * hid] + hsum.reshape(B_, Hb, Wb, 4, 2 * hid)
        reset = jax.nn.sigmoid(gsum[..., :hid]).reshape(hs.shape)
        update = jax.nn.sigmoid(gsum[..., hid:]).reshape(hs.shape)
        ch = conv3x3_s2d(reset * hs, kc[:, :, cx:].astype(dt), reflect=False)
        cand = jnp.tanh(xsr[..., 2 * hid:].reshape(hs.shape) + ch)
        return (1.0 - update) * hs + update * cand

    for s, (Hs, Ws, cx, hid, ff) in enumerate(scales):
        x = jnp.asarray(rng.rand(B, Hs, Ws, cx).astype(np.float32)).astype(dt)
        h = jnp.asarray(rng.rand(B, Hs, Ws, hid).astype(np.float32)).astype(dt)
        cell = ConvGRUCell(hidden_dim=hid, dtype=dt)
        cp = cell.init(jax.random.PRNGKey(s), x, h)

        for mode in ("nhwc", "planar"):
            os.environ["SSDE_PLANAR_GRU"] = "0" if mode == "nhwc" else "1"

            def cf(p, xx, hh, _cell=cell, _m=mode, _s=s):
                os.environ["SSDE_PLANAR_GRU"] = "0" if _m == "nhwc" else "1"
                return _cell.apply(p, xx, hh)

            run(f"cell_s{s}_{mode}", cf, cp, x, h)

        xs2, hs2 = space_to_depth(x), space_to_depth(h)
        run(f"cell_s{s}_s2d",
            lambda p, a, b, _cx=cx, _hid=hid: cell_s2d(p, a, b, _cx, _hid),
            cp, xs2, hs2)

        os.environ["SSDE_PLANAR_GRU"] = "0"
        f1 = jnp.asarray(rng.rand(B, Hs, Ws, ff).astype(np.float32)).astype(dt)
        f2 = jnp.asarray(rng.rand(B, Hs, Ws, ff).astype(np.float32)).astype(dt)
        for att in (False, True):
            fus = GRUFusionBlock_v2(ff, up=(s > 0), attention=att, dtype=dt)
            fp = fus.init(jax.random.PRNGKey(10 + s), f1, f2)
            tag = "att" if att else "nhwc"
            run(f"fusion_s{s}_{tag}",
                lambda p, a, b, _f=fus: _f.apply(p, a, b), fp, f1, f2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
