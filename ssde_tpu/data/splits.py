"""Split-file handling.

The reference ships KITTI split lists under ``splits/<name>/{train,val,
test}_files.txt`` with lines ``"<scene_dir> <frame_idx> <l|r>"`` plus
sequence-scene lists for the GRU pipeline (reference splits/**). Those
lists are data artifacts of the Eigen/Zhou protocol — this framework reads
the same format from a configurable ``splits_dir`` (default:
``<repo>/splits``). Use ``scripts/import_splits.py`` to copy them from a
monodepth2 / reference checkout.
"""

from __future__ import annotations

import os
from typing import List

DEFAULT_SPLITS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "splits")


def readlines(filename: str) -> List[str]:
    """Read all lines, stripped (reference utils.py:14-19)."""
    with open(filename) as f:
        return f.read().splitlines()


def split_file(split: str, which: str, splits_dir: str | None = None) -> str:
    """Path to ``splits/<split>/<which>_files.txt``.

    The reference's lists use two naming conventions: ``train_files.txt``
    (frame lists) but ``train_sequences.txt`` / ``test_files_09.txt``
    (scene/odometry lists, no ``_files`` suffix — reference
    trainer_gru.py:218, evaluate_pose.py:58). Resolve ``<which>_files.txt``
    first and fall back to ``<which>.txt`` when only that exists, so call
    sites can use the short name for either convention.
    """
    d = splits_dir or os.environ.get("SSDE_SPLITS_DIR") or DEFAULT_SPLITS_DIR
    cand = os.path.join(d, split, f"{which}_files.txt")
    alt = os.path.join(d, split, f"{which}.txt")
    if not os.path.exists(cand) and os.path.exists(alt):
        return alt
    return cand


def parse_line(line: str):
    """``"<folder> <frame_index> <side>"`` -> (folder, frame_index, side)."""
    parts = line.split()
    folder = parts[0]
    frame_index = int(parts[1]) if len(parts) == 3 else 0
    side = parts[2] if len(parts) == 3 else None
    return folder, frame_index, side
