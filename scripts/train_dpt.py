#!/usr/bin/env python
"""--model selector training entry — reference train_dpt.py / trainer_dpt.py.

Models:
  monodepth2                 plain ResNet encoder + DepthDecoder
  rn_encoder_with_attention  attention-augmented encoder
  rn_fusion                  Fusion_v3 trainer
  dpt_gru                    native ViT-hybrid DPT (models/dpt.py). The
                             reference imports an external, un-vendored
                             `dpt` package (trainer_dpt.py:30) so its
                             config cannot run as checked in; here the
                             model is implemented natively and trains.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssde_tpu.config import MonodepthOptions
from ssde_tpu.train.trainer import (
    AttentionTrainer,
    DPTTrainer,
    FusionV3Trainer,
    Trainer,
)

if __name__ == "__main__":
    opts = MonodepthOptions().parse()
    if opts.model == "monodepth2":
        trainer = Trainer(opts)
    elif opts.model == "rn_encoder_with_attention":
        trainer = AttentionTrainer(opts)
    elif opts.model == "rn_fusion":
        trainer = FusionV3Trainer(opts)
    elif opts.model == "dpt_gru":
        trainer = DPTTrainer(opts)
    else:
        raise ValueError(f"unknown --model {opts.model}")
    trainer.train()
