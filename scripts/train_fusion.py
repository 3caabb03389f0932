#!/usr/bin/env python
"""3-frame attention-fusion training (pre-disp PixelShuffle pyramid) —
reference train_fusion.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssde_tpu.config import MonodepthOptions
from ssde_tpu.train.trainer import FusionTrainer

if __name__ == "__main__":
    opts = MonodepthOptions().parse()
    trainer = FusionTrainer(opts)
    trainer.train()
