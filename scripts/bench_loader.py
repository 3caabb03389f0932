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
    """Minimal dataset: decode + resize 3 frames per item (mono contract)."""

    def __init__(self, paths, width, height):
        self.paths = paths
        self.width = width
        self.height = height

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from ssde_tpu.data.kitti import pil_load_resized

        out = {}
        for j, f in enumerate((0, -1, 1)):
            p = self.paths[(i + j) % len(self.paths)]
            out[f"color/{f}"] = pil_load_resized(p, self.width, self.height,
                                                 False)
        out["K"] = np.eye(4, dtype=np.float32)
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--src_width", type=int, default=1242)
    ap.add_argument("--src_height", type=int, default=375)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--workers", type=str, default="1,2,4,8")
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
