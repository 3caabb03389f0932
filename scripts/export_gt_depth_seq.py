#!/usr/bin/env python
"""Precompute scene-sorted gt_depths_seq.npz for streaming sequence eval —
reference export_gt_depth_seq.py.

Test lines are grouped by scene and sorted by frame index so that stateful
(whole-scene) GRU evaluation can consume GT in stream order.
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssde_tpu.data.kitti_utils import generate_depth_map
from ssde_tpu.data.splits import readlines, split_file


def export_gt_depths_seq(data_path: str, split: str):
    lines = readlines(split_file(split, "test"))
    by_scene = defaultdict(list)
    for line in lines:
        folder, frame_id, side = line.split()
        by_scene[folder].append(int(frame_id))

    gt_depths, index = [], []
    for folder in sorted(by_scene):
        for frame_id in sorted(by_scene[folder]):
            calib_dir = os.path.join(data_path, folder.split("/")[0])
            velo = os.path.join(
                data_path, folder,
                "velodyne_points/data", "{:010d}.bin".format(frame_id),
            )
            gt_depths.append(generate_depth_map(calib_dir, velo, 2, True)
                             .astype(np.float32))
            index.append(f"{folder} {frame_id}")

    output_path = os.path.join(os.path.dirname(split_file(split, "test")),
                               "gt_depths_seq.npz")
    print(f"Saving {len(gt_depths)} depths to {output_path}")
    np.savez_compressed(output_path, data=np.array(gt_depths, dtype="object"),
                        index=np.array(index))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="export_gt_depth_seq")
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--split", type=str, default="eigen",
                        choices=["eigen", "eigen_benchmark"])
    args = parser.parse_args()
    export_gt_depths_seq(args.data_path, args.split)
