"""Recurrent sequence trainer (reference trainer_gru.py equivalent).

The flagship path (BASELINE.json config #4): ConvGRU/ConvLSTM temporal
depth state over T-frame KITTI video tuples, trained with the
min-reprojection loss on every timestep. See steps_gru.py for the jitted
step; this class owns data, the h0-freeze schedule and checkpoints.

``--h_s_epoch``: after that epoch the learned initial hidden states stop
training (reference trainer_gru.py:295-307) — implemented by rebuilding
the optimizer with an h0/c0 gradient mask while keeping Adam moments.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..config import Options
from ..data import Loader
from ..data.sequence import (
    KITTISeqDataset,
    count_scene_frames,
    generate_frame_tuples,
)
from ..data.splits import readlines, split_file
from ..data.synthetic import SyntheticSeqDataset
from ..parallel import make_mesh, shard_batch
from .state import TrainState, create_optimizer
from .steps_gru import (
    build_gru_models,
    gru_loss_fn,
    init_gru_params,
    make_gru_train_step,
    preprocess_gru_batch,
)
from .trainer import TrainerBase


class GRUTrainer(TrainerBase):
    variant = "gru"

    def __init__(self, options: Options):
        options.frame_ids = [0, -1, 1]
        # the reference force-enables hidden-state fusion at startup
        # (trainer_gru.py:62: ``self.opt.fuse = True``); its --fuse 0
        # concat branch is unreachable and shape-broken. Mirror the force
        # loudly instead of silently training a different model.
        if not options.fuse:
            print("---> --fuse 0 is overridden to 1 (the reference forces "
                  "fuse=True, trainer_gru.py:62; the concat branch is "
                  "unreachable there)")
            options.fuse = 1
        # the sequence dataset has no opposite-camera frames, so stereo
        # training is not supported here — fail with a clear config error
        # instead of a KeyError('stereo_T') at trace time
        if options.use_stereo:
            raise ValueError(
                "--use_stereo is not supported by the GRU trainer: "
                "KITTISeqDataset emits temporal tuples only (no color/s "
                "or stereo_T). Use train.py / train_fusion.py for stereo."
            )
        self._h0_frozen = False
        super().__init__(options)

    def _frame_idxs(self):
        return [0, -1, 1]

    def _build_data(self):
        opt = self.opt
        if opt.synthetic_data:
            self.train_dataset = SyntheticSeqDataset(
                opt.height, opt.width, n=opt.len_sequence,
                length=opt.batch_size * 4,
            )
            self.val_dataset = SyntheticSeqDataset(
                opt.height, opt.width, n=opt.len_sequence,
                length=opt.batch_size * 2, is_train=False,
            )
        else:
            train_scenes = readlines(split_file(opt.split, "train_sequences"))
            val_scenes = readlines(split_file(opt.split, "val_sequences"))
            n_frames = count_scene_frames(train_scenes + val_scenes, opt.data_path)
            # k=2 extra frames: tuple windows are length T+2 so every centre
            # frame has both +-1 neighbours (reference trainer_gru.py:222)
            train_tuples = generate_frame_tuples(
                n_frames, train_scenes, opt.len_sequence, 2, opt.train_n_tuples
            )
            val_tuples = generate_frame_tuples(
                n_frames, val_scenes, opt.len_sequence, 2, opt.test_n_tuples
            )
            self.train_dataset = KITTISeqDataset(
                opt.data_path, train_tuples, opt.height, opt.width,
                opt.len_sequence, is_train=True,
                decoded_cache=opt.decoded_cache,
            )
            self.val_dataset = KITTISeqDataset(
                opt.data_path, val_tuples, opt.height, opt.width,
                opt.len_sequence, is_train=False,
                decoded_cache=opt.decoded_cache,
            )
        self.train_loader = Loader(
            self.train_dataset, opt.batch_size, shuffle=True, drop_last=True,
            num_workers=opt.num_workers,
        )
        self.val_loader = Loader(
            self.val_dataset, opt.batch_size, shuffle=False, drop_last=True,
            num_workers=opt.num_workers,
        )
        self._val_iter = None

    def _build_models_and_state(self):
        opt = self.opt
        from ..data.pipeline import collate

        items = [self.train_dataset[i] for i in range(min(2, len(self.train_dataset)))]
        batch = collate(items * (opt.batch_size // len(items) + 1))
        batch = {k: v[: opt.batch_size] for k, v in batch.items()}

        self.models = build_gru_models(opt)
        params, batch_stats = init_gru_params(self.models, jax.random.PRNGKey(0), batch)

        if opt.mono_pretrained and opt.load_weights_folder is None:
            folder = os.path.join("models", "mono_640x192")
            if os.path.isdir(folder):
                print("---> Load monodepth2 weights")
                from ..checkpoint import load_monodepth2_checkpoint

                p, s, _ = load_monodepth2_checkpoint(folder)
                for k in p:
                    if k in params:
                        params[k] = p[k]
                for k in s:
                    if k in batch_stats:
                        batch_stats[k] = s[k]

        # reference trainer_gru.py:316 never steps its StepLR -> constant LR
        # unless the user opts into decay with --gru_lr_decay
        self._gru_step_size = (opt.scheduler_step_size if opt.gru_lr_decay
                               else 0)
        tx = create_optimizer(
            opt.learning_rate, self._gru_step_size,
            max(1, len(self.train_loader)),
        )
        self.state = TrainState.create(params, batch_stats, tx)
        if opt.load_weights_folder is not None:
            self.load_model()
        self.train_step = make_gru_train_step(self.models)

    def run_epoch(self):
        # freeze learned h0/c0 once h_s_epoch is reached
        if self.epoch >= self.opt.h_s_epoch and not self._h0_frozen:
            print(f"---> Freezing learned hidden states at epoch {self.epoch}")
            tx = create_optimizer(
                self.opt.learning_rate, self._gru_step_size,
                max(1, len(self.train_loader)), freeze_h0=True,
            )
            self.state = self.state.replace(tx=tx)
            self._h0_frozen = True
        super().run_epoch()

    def process_batch(self, batch, rng=None):
        inputs, B, T = preprocess_gru_batch(batch, self.opt, is_train=False)
        loss, (_, losses, outputs) = gru_loss_fn(
            self.models, self.state.params, self.state.batch_stats,
            inputs, B, T, rng, train=False,
        )
        return inputs, outputs, losses

    def compute_depth_losses(self, batch, outputs):
        gt = np.asarray(batch["depth_gt"])  # (B, T, H, W)
        flat = {"depth_gt": gt.reshape((-1,) + gt.shape[2:])}
        return super().compute_depth_losses(flat, outputs)
