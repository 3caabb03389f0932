#!/usr/bin/env python
"""Bisect the 320x1024 train-step compile crash by kernel backend.

The hires bench config (BASELINE #5) dies in the remote compile helper;
this script compiles+runs one tiny-batch step per backend combination to
identify which kernel's hires variant kills the compiler.

Usage: python scripts/debug_hires.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ssde_tpu.utils import enable_compile_cache

enable_compile_cache()

from ssde_tpu.config import Options
from ssde_tpu.data import make_synthetic_batch
from ssde_tpu.data.transforms import preprocess_batch
from ssde_tpu.train import (
    TrainState,
    build_mono_models,
    create_optimizer,
    init_mono_params,
    make_mono_train_step,
)

CONFIGS = [
    ("no_pallas_loss+banded", dict(use_pallas=False, warp_backend="banded")),
    ("pallas_loss+onehot", dict(use_pallas=True, warp_backend="onehot")),
    ("pallas_loss+banded", dict(use_pallas=True, warp_backend="banded")),
]


def main():
    B = int(os.environ.get("BENCH_HIRES_BATCH", "4"))
    which = os.environ.get("HIRES_CONFIGS")
    for name, kw in CONFIGS:
        if which and name not in which.split(","):
            continue
        print(f"--- {name}", flush=True)
        try:
            opts = Options(height=320, width=1024, batch_size=B,
                           num_layers=18, compute_dtype="bfloat16",
                           frame_ids=[0, -1, 1], scales=[0, 1, 2, 3], **kw)
            models = build_mono_models(opts)
            batch = make_synthetic_batch(B, opts.height, opts.width)
            batch = jax.tree.map(jax.device_put, batch)
            inputs = preprocess_batch(batch, opts.height, opts.width,
                                      opts.num_scales, opts.frame_ids)
            params, stats = init_mono_params(models, jax.random.PRNGKey(0),
                                             inputs)
            state = TrainState.create(params, stats,
                                      create_optimizer(1e-4, 15, 1000))
            step = make_mono_train_step(models)
            state, losses = step(state, batch, jax.random.PRNGKey(1))
            print(f"{name}: OK loss={float(losses['loss']):.4f}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
