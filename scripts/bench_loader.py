#!/usr/bin/env python
"""Host data-loader micro-benchmark: JPEG decode throughput vs TPU demand.

Writes synthetic KITTI-sized JPEGs to a temp dir, then measures images/s
through the Loader with thread vs process pools at several worker counts.
Compare the winner against the training step's feed demand
(samples/s x 3 frames/sample for the mono trainer).

Usage: python scripts/bench_loader.py [--n_images 256] [--workers 1,4,8,12]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _JpegDataset:
    """Minimal dataset: decode + resize 3 frames per item (mono contract).

    ``cache_dir`` switches to the decode-once uint8 path
    (data/kitti.load_resized_uint8) — the fix for a host-bound feed.
    """

    def __init__(self, paths, width, height, cache_dir=None):
        self.paths = paths
        self.width = width
        self.height = height
        self.cache_dir = cache_dir

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from ssde_tpu.data.kitti import load_resized_uint8, pil_load_resized

        out = {}
        for j, f in enumerate((0, -1, 1)):
            p = self.paths[(i + j) % len(self.paths)]
            if self.cache_dir is not None:
                out[f"color/{f}"] = load_resized_uint8(
                    p, self.width, self.height, False, self.cache_dir)
            else:
                out[f"color/{f}"] = pil_load_resized(p, self.width,
                                                     self.height, False)
        out["K"] = np.eye(4, dtype=np.float32)
        return out


def bench_fed(args, paths, tmp):
    """Train-step throughput fed by the REAL Loader (not device-resident
    synthetic data): measures the sustained loader+step pipeline, the
    number that bounds real-KITTI training (round-3 verdict item 4).
    Run with --fed [--cache] on the TPU host."""
    import jax

    from ssde_tpu.config import Options
    from ssde_tpu.data.pipeline import Loader
    from ssde_tpu.train import (
        TrainState, build_mono_models, create_optimizer, init_mono_params,
    )
    from ssde_tpu.train.steps import make_mono_train_step
    from ssde_tpu.data.transforms import preprocess_batch
    from ssde_tpu.utils import enable_compile_cache

    enable_compile_cache()
    B = args.batch_size
    cache = os.path.join(tmp, "u8cache") if args.cache else None
    ds = _JpegDataset(paths, args.width, args.height, cache_dir=cache)
    if cache:  # prime the decode-once cache (first epoch cost, reported)
        t0 = time.perf_counter()
        for i in range(len(ds)):
            ds[i]
        print(f"cache prime: {len(ds) / (time.perf_counter() - t0):.1f} items/s")

    opts = Options(height=args.height, width=args.width, batch_size=B,
                   num_layers=18, compute_dtype="bfloat16",
                   frame_ids=[0, -1, 1], scales=[0, 1, 2, 3])
    models = build_mono_models(opts)
    loader = Loader(ds, B, shuffle=False, drop_last=True,
                    num_workers=args.fed_workers)
    first = next(iter(loader))
    inputs = preprocess_batch(jax.tree.map(jax.device_put, first),
                              args.height, args.width, 4, [0, -1, 1])
    params, stats = init_mono_params(models, jax.random.PRNGKey(0), inputs)
    state = TrainState.create(params, stats, create_optimizer(1e-4, 15, 1000))
    step = make_mono_train_step(models)
    rng = jax.random.PRNGKey(0)
    # compile + warm
    state, losses = step(state, first, rng)
    float(jax.device_get(losses["loss"]))

    # A/B: the trainer's default device_prefetch pipeline (batch N+1's
    # H2D DMA enqueued before step N) vs handing host batches straight to
    # the jitted step (implicit synchronous transfer)
    from ssde_tpu.parallel import device_prefetch, make_mesh

    mesh = make_mesh(1, batch_size=B)
    mode = "uint8-cache" if args.cache else "jpeg-decode"

    def run(label, iterate):
        nonlocal rng, state
        n = 0
        t0 = time.perf_counter()
        losses = None
        for epoch in range(args.fed_epochs):
            for batch in iterate():
                rng, k = jax.random.split(rng)
                state, losses = step(state, batch, k)
                n += B
        float(jax.device_get(losses["loss"]))
        dt = time.perf_counter() - t0
        print(f"loader-fed step [{mode}, {args.fed_workers} workers, "
              f"{label}]: {n / dt:.1f} samples/s over {n} samples",
              flush=True)

    def plain_prefetch():
        from collections import deque

        buf = deque()
        for b in loader:
            buf.append(jax.tree.map(jax.device_put, b))
            if len(buf) >= 2:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    run("direct", lambda: iter(loader))
    run("device_prefetch", lambda: device_prefetch(iter(loader), mesh))
    run("plain_put_prefetch", plain_prefetch)
    run("direct2", lambda: iter(loader))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--src_width", type=int, default=1242)
    ap.add_argument("--src_height", type=int, default=375)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--workers", type=str, default="1,2,4,8")
    ap.add_argument("--fed", action="store_true",
                    help="feed the real jitted train step from the Loader")
    ap.add_argument("--cache", action="store_true",
                    help="use the decode-once uint8 cache in --fed mode")
    ap.add_argument("--fed_workers", type=int, default=2)
    ap.add_argument("--fed_epochs", type=int, default=3)
    args = ap.parse_args()

    from PIL import Image

    from ssde_tpu.data.pipeline import Loader

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="ssde_loader_bench_")
    paths = []
    base = rng.randint(0, 255, (args.src_height, args.src_width, 3), np.uint8)
    for i in range(args.n_images):
        p = os.path.join(tmp, f"{i:06d}.jpg")
        # shift so files differ (defeats any OS-level dedup)
        Image.fromarray(np.roll(base, i, axis=1)).save(p, quality=90)
        paths.append(p)

    if args.fed:
        bench_fed(args, paths, tmp)
        for p in paths:
            os.unlink(p)
        return

    ds = _JpegDataset(paths, args.width, args.height)
    print(f"{args.n_images} JPEGs {args.src_width}x{args.src_height} -> "
          f"{args.width}x{args.height}, 3 frames/item, batch {args.batch_size}")
    print(f"{'pool':>9} {'workers':>7} {'items/s':>9} {'frames/s':>9}")
    for use_proc in (False, True):
        for w in [int(x) for x in args.workers.split(",")]:
            loader = Loader(ds, args.batch_size, shuffle=False, drop_last=True,
                            num_workers=w, use_processes=use_proc)
            n = 0
            t0 = time.perf_counter()
            for batch in loader:
                n += batch["color/0"].shape[0]
            dt = time.perf_counter() - t0
            kind = "process" if use_proc else "thread"
            print(f"{kind:>9} {w:>7} {n / dt:>9.1f} {3 * n / dt:>9.1f}")

    for p in paths:
        os.unlink(p)
    os.rmdir(tmp)


if __name__ == "__main__":
    main()
