#!/usr/bin/env python
"""--model selector training entry — reference train_dpt.py / trainer_dpt.py.

Models:
  monodepth2                 plain ResNet encoder + DepthDecoder
  rn_encoder_with_attention  attention-augmented encoder
  rn_fusion                  Fusion_v3 trainer
  dpt_gru                    ViT-hybrid DPT — the reference imports an
                             external, un-vendored `dpt` package
                             (trainer_dpt.py:30) so this config cannot run
                             as checked in; we keep the flag surface and
                             error with the same effective behaviour.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssde_tpu.config import MonodepthOptions
from ssde_tpu.train.trainer import AttentionTrainer, FusionV3Trainer, Trainer

if __name__ == "__main__":
    opts = MonodepthOptions().parse()
    if opts.model == "monodepth2":
        trainer = Trainer(opts)
    elif opts.model == "rn_encoder_with_attention":
        trainer = AttentionTrainer(opts)
    elif opts.model == "rn_fusion":
        trainer = FusionV3Trainer(opts)
    elif opts.model == "dpt_gru":
        raise NotImplementedError(
            "dpt_gru requires the external `dpt` package, which the reference "
            "does not vendor (trainer_dpt.py:30); it cannot run as checked in."
        )
    else:
        raise ValueError(f"unknown --model {opts.model}")
    trainer.train()
