#!/usr/bin/env python
"""Import KITTI split lists from an existing monodepth2/reference checkout.

The split files (eigen/eigen_zhou/eigen_full/benchmark/odom lists plus the
GRU sequence-scene lists) are data artifacts of the published Eigen/Zhou
protocol, not code; this framework reads them from ``splits/`` at the repo
root. Run:

    python scripts/import_splits.py --source /path/to/monodepth2/splits
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssde_tpu.data.splits import DEFAULT_SPLITS_DIR


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", required=True,
                        help="path to a splits/ directory to copy from")
    parser.add_argument("--dest", default=DEFAULT_SPLITS_DIR)
    args = parser.parse_args()

    n = 0
    for root, _, files in os.walk(args.source):
        rel = os.path.relpath(root, args.source)
        for f in files:
            if not (f.endswith(".txt") or f.endswith(".npy")):
                continue
            dst_dir = os.path.join(args.dest, rel)
            os.makedirs(dst_dir, exist_ok=True)
            shutil.copy2(os.path.join(root, f), os.path.join(dst_dir, f))
            n += 1
    print(f"Imported {n} split files into {args.dest}")


if __name__ == "__main__":
    main()
