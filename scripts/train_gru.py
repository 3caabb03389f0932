#!/usr/bin/env python
"""Recurrent (ConvGRU/ConvLSTM) sequence training — reference train_gru.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssde_tpu.config import MonodepthOptions
from ssde_tpu.train.trainer_gru import GRUTrainer

if __name__ == "__main__":
    opts = MonodepthOptions().parse()
    trainer = GRUTrainer(opts)
    trainer.train()
