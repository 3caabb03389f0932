#!/usr/bin/env python
"""Fusion_v3 multi-frame training — reference train_fusion_v3.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssde_tpu.config import MonodepthOptions
from ssde_tpu.train.trainer import FusionV3Trainer

if __name__ == "__main__":
    opts = MonodepthOptions().parse()
    trainer = FusionV3Trainer(opts)
    trainer.train()
