#!/usr/bin/env python
"""Precompute gt_depths.npz for a split — reference export_gt_depth.py."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssde_tpu.data.kitti_utils import generate_depth_map
from ssde_tpu.data.splits import readlines, split_file


def export_gt_depths_kitti(data_path: str, split: str):
    lines = readlines(split_file(split, "test"))
    print(f"Exporting ground truth depths for {split}")
    gt_depths = []
    for line in lines:
        folder, frame_id, _ = line.split()
        frame_id = int(frame_id)
        if split == "eigen":
            calib_dir = os.path.join(data_path, folder.split("/")[0])
            velo = os.path.join(
                data_path, folder,
                "velodyne_points/data", "{:010d}.bin".format(frame_id),
            )
            gt_depth = generate_depth_map(calib_dir, velo, 2, True)
        elif split == "eigen_benchmark":
            from PIL import Image

            gt_path = os.path.join(
                data_path, folder, "proj_depth", "groundtruth", "image_02",
                "{:010d}.png".format(frame_id),
            )
            gt_depth = np.asarray(Image.open(gt_path)).astype(np.float32) / 256
        else:
            raise ValueError(f"unsupported split {split}")
        gt_depths.append(gt_depth.astype(np.float32))

    output_path = os.path.join(os.path.dirname(split_file(split, "test")),
                               "gt_depths.npz")
    print(f"Saving to {output_path}")
    np.savez_compressed(output_path, data=np.array(gt_depths, dtype="object"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="export_gt_depth")
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--split", type=str, required=True,
                        choices=["eigen", "eigen_benchmark"])
    args = parser.parse_args()
    export_gt_depths_kitti(args.data_path, args.split)
