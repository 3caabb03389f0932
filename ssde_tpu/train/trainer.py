"""Trainers: thin epoch loops around jitted steps.

Keeps the reference Trainer surface — ``Trainer(options)``, ``.train()``,
``.process_batch()``, ``.val()``, ``.save_model()``, ``.load_model()``
(reference trainer.py:31-763) — but all heavy lifting lives in one jitted
step per variant; the Python loop only feeds batches and logs.

Variants (mirroring the five reference trainers):
  * ``Trainer``            — plain monodepth2 (trainer_dpt.py "monodepth2"
                             branch; also covers "rn_encoder_with_attention")
  * ``FusionTrainer``      — trainer_fusion.py (pre-disp PixelShuffle Fusion)
  * ``FusionV3Trainer``    — trainer_fusion_v3.py (Fusion_v3 on disps)
  * ``FusionScaleLoopTrainer`` — trainer.py (per-scale shared fusion block)
  * ``GRUTrainer``         — trainer_gru.py (see trainer_gru.py module)
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import load_checkpoint, load_monodepth2_checkpoint, save_checkpoint
from ..config import Options
from ..data import Loader, SyntheticKittiDataset
from ..data.kitti import KITTIOdomDataset, KITTIRAWDataset
from ..data.splits import readlines, split_file
from ..data.transforms import preprocess_batch
from ..eval.depth import compute_errors
from ..logging_utils import TimeLogger, Writers, save_opts
from ..ops import disp_to_depth, resize_bilinear
from ..parallel import device_prefetch, make_mesh, shard_batch
from .state import TrainState, create_optimizer
from .steps import (
    build_mono_models,
    init_mono_params,
    make_mono_train_step,
    mono_loss_fn,
)
from .steps_fusion import (
    build_fusion_models,
    fusion_loss_fn,
    init_fusion_params,
    make_fusion_train_step,
)

# train-time GT crop (garg) rows/cols of 375x1242 (reference trainer.py:639-640)
GARG_CROP = (153, 371, 44, 1197)


class TrainerBase:
    variant: str = "mono"

    def __init__(self, options: Options):
        self.opt = options
        self.log_path = os.path.join(self.opt.log_dir, self.opt.model_name)

        assert self.opt.height % 32 == 0, "'height' must be a multiple of 32"
        assert self.opt.width % 32 == 0, "'width' must be a multiple of 32"
        assert self.opt.frame_ids[0] == 0, "frame_ids must start with 0"

        # --use_stereo appends the opposite-camera frame "s" so the dataset
        # loads it and the loss warps from it (reference trainer.py:59-60);
        # runs after subclass __init__s force their frame_ids.
        if self.opt.use_stereo and "s" not in self.opt.frame_ids:
            self.opt.frame_ids = list(self.opt.frame_ids) + ["s"]

        if self.opt.matmul_precision != "default":
            jax.config.update("jax_default_matmul_precision",
                              self.opt.matmul_precision)

        self.mesh = make_mesh(self.opt.num_devices, batch_size=self.opt.batch_size)
        self.step = 0
        self.epoch = 0

        self._build_data()
        self._build_models_and_state()

        self.writers = Writers(self.log_path)
        self.num_total_steps = (
            len(self.train_loader) * self.opt.num_epochs
            if hasattr(self, "train_loader") else 0
        )
        self.time_logger = TimeLogger(self.num_total_steps, self.opt.batch_size)
        save_opts(self.log_path, self.opt)

        print(f"Training model named: {self.opt.model_name}")
        print(f"Devices: {[str(d) for d in jax.devices()]}")
        print(f"Training is using mesh: {self.mesh}")

    # ------------------------------------------------------------- data
    def _frame_idxs(self):
        ids = list(self.opt.frame_ids)
        if self.opt.use_stereo and "s" not in ids:
            ids.append("s")
        return ids

    def _train_files(self):
        return readlines(split_file(self.opt.split, "train"))

    def _build_data(self):
        opt = self.opt
        if opt.synthetic_data:
            self.train_dataset = SyntheticKittiDataset(
                opt.height, opt.width, length=opt.batch_size * 8,
                frame_idxs=self._frame_idxs(),
            )
            self.val_dataset = SyntheticKittiDataset(
                opt.height, opt.width, length=opt.batch_size * 2,
                frame_idxs=self._frame_idxs(), is_train=False,
            )
        else:
            # the reference's dict has only kitti/kitti_odom and would
            # KeyError on the other --dataset choices (trainer.py:139-141);
            # we additionally wire kitti_depth to the improved-GT dataset.
            from ..data.kitti import KITTIDepthDataset

            ds_cls = {
                "kitti": KITTIRAWDataset,
                "kitti_odom": KITTIOdomDataset,
                "kitti_depth": KITTIDepthDataset,
            }.get(opt.dataset, KITTIRAWDataset)
            img_ext = ".png" if opt.png else ".jpg"
            train_files = self._train_files()
            val_files = readlines(split_file(opt.split, "val"))
            self.train_dataset = ds_cls(
                opt.data_path, train_files, opt.height, opt.width,
                self._frame_idxs(), is_train=True, img_ext=img_ext,
                decoded_cache=opt.decoded_cache,
            )
            self.val_dataset = ds_cls(
                opt.data_path, val_files, opt.height, opt.width,
                self._frame_idxs(), is_train=False, img_ext=img_ext,
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
        self._val_failures = 0

    # ------------------------------------------------- models and state
    def _build_models_and_state(self):
        opt = self.opt
        sample = self._sample_batch()
        self.models = self._build_models()
        inputs = preprocess_batch(sample, opt.height, opt.width, opt.num_scales,
                                  self._frame_idxs(), is_train=False)
        params, batch_stats = self._init_params(jax.random.PRNGKey(0), inputs)

        if opt.mono_pretrained and opt.load_weights_folder is None:
            folder = os.path.join("models", "mono_640x192")
            if os.path.isdir(folder):
                print("---> Load monodepth2 weights")
                p, s, _ = load_monodepth2_checkpoint(folder)
                for k in p:
                    if k in params:
                        params[k] = p[k]
                for k in s:
                    if k in batch_stats:
                        batch_stats[k] = s[k]

        tx = create_optimizer(
            opt.learning_rate, opt.scheduler_step_size,
            max(1, len(self.train_loader)),
        )
        self.state = TrainState.create(params, batch_stats, tx)

        if opt.load_weights_folder is not None:
            self.load_model()

        self.train_step = self._make_train_step()
        self._loss_fn = None

    def _sample_batch(self):
        from ..data.pipeline import collate

        items = [self.train_dataset[i] for i in range(min(2, len(self.train_dataset)))]
        batch = collate(items * (self.opt.batch_size // len(items) + 1))
        return {k: v[: self.opt.batch_size] for k, v in batch.items()}

    def _build_models(self):
        return build_mono_models(self.opt)

    def _init_params(self, rng, inputs):
        return init_mono_params(self.models, rng, inputs)

    def _make_train_step(self):
        return make_mono_train_step(self.models)

    # ------------------------------------------------------------ train
    def train(self):
        self.start_time = time.time()
        for self.epoch in range(self.opt.num_epochs):
            self.run_epoch()
            if (self.epoch + 1) % self.opt.save_frequency == 0:
                self.save_model()

    def run_epoch(self):
        print(f"Training epoch {self.epoch}", flush=True)
        # advance the per-item augmentation streams (data/kitti.item_rng):
        # fresh flip/jitter coins each epoch, deterministic per (seed,
        # epoch, index) regardless of worker schedule
        if hasattr(self.train_dataset, "set_epoch"):
            self.train_dataset.set_epoch(self.epoch)
        rng = jax.random.PRNGKey(self.epoch)
        # device_prefetch: batch N+1's host->device transfer is enqueued
        # before step N is dispatched, so DMA overlaps compute (the default
        # training path; see parallel/mesh.py)
        for batch_idx, sharded in enumerate(
            device_prefetch(self.train_loader, self.mesh)
        ):
            before = time.time()
            rng, key = jax.random.split(rng)
            # optional jax.profiler window (steps 5 .. 5+profile_steps)
            if self.opt.profile_steps and self.step == 5:
                jax.profiler.start_trace(os.path.join(self.log_path, "profile"))
            if self.opt.profile_steps and self.step == 5 + self.opt.profile_steps:
                jax.profiler.stop_trace()
            self.state, losses = self.train_step(self.state, sharded, key)

            early_phase = (
                batch_idx % self.opt.log_frequency == 0 and self.step < 2000
            )
            late_phase = self.step % 2000 == 0
            if early_phase or late_phase:
                loss_val = float(losses["loss"])
                self.time_logger.log(self.step, time.time() - before, loss_val)
                self.writers.scalars(
                    "train", self.step,
                    {k: float(v) for k, v in losses.items()},
                )
                self.val()
            self.step += 1

    # -------------------------------------------------------------- val
    def process_batch(self, batch, rng=None):
        """Forward one batch in eval mode, returning (outputs, losses)."""
        inputs = preprocess_batch(
            batch, self.opt.height, self.opt.width, self.opt.num_scales,
            self._frame_idxs(), is_train=False,
        )
        loss, (_, losses, outputs) = self._eval_loss(inputs, rng)
        return inputs, outputs, losses

    def _eval_loss(self, inputs, rng):
        return mono_loss_fn(self.models, self.state.params,
                            self.state.batch_stats, inputs, rng, train=False)

    def val(self):
        if self._val_iter is None:
            self._val_iter = iter(self.val_loader)
        try:
            batch = next(self._val_iter)
        except StopIteration:
            self._val_iter = iter(self.val_loader)
            batch = next(self._val_iter)
        if len(self.mesh.devices.flat) > 1:
            # multi-device: the batch axis must land sharded; on one
            # device the jit-boundary transfer is the measured-fast path
            # (see parallel/mesh.device_prefetch)
            batch = shard_batch(batch, self.mesh)
        try:
            inputs, outputs, losses = self.process_batch(batch)
        except Exception as e:
            # one flaky val batch must not kill a long training run, but a
            # permanently-broken val path must not degrade to a print in a
            # log nobody reads: re-raise after 5 consecutive failures
            self._val_failures += 1
            print(f"val failed ({self._val_failures} consecutive): {e}")
            if self._val_failures >= 5:
                raise
            return
        self._val_failures = 0
        scalars = {k: float(v) for k, v in losses.items()}
        self._check_band_violation(scalars)
        if "depth_gt" in batch:
            scalars.update(self.compute_depth_losses(batch, outputs))
        self.writers.scalars("val", self.step, scalars)
        self.writers.images("val", self.step, inputs, outputs,
                            self.opt.scales, [0])

    def _check_band_violation(self, scalars):
        """Guard on the banded-warp approximation (round-3 verdict item 6).

        The banded warp kernel clamps source rows outside its vertical band
        (ops/pallas/warp_banded.py); ``warp/band_violation`` reports the
        fraction of clamped output rows. Transient non-zero values are
        normal early in training (wild pose predictions); a SUSTAINED
        violation means ``--warp_vband`` is too small for this config and
        the photometric loss is silently wrong — stop with advice rather
        than train a corrupted model.
        """
        viol = scalars.get("warp/band_violation", 0.0)
        if viol > 1e-4:
            self._band_violation_streak = getattr(
                self, "_band_violation_streak", 0) + 1
            print(f"WARNING: warp/band_violation={viol:.2e} "
                  f"({self._band_violation_streak} consecutive val checks)")
            if self._band_violation_streak >= 5:
                raise RuntimeError(
                    f"banded-warp violation {viol:.2e} sustained over "
                    f"{self._band_violation_streak} val checks: raise "
                    f"--warp_vband (currently {self.opt.warp_vband}) or use "
                    f"--warp_backend gather for an exact warp"
                )
        else:
            self._band_violation_streak = 0

    def compute_depth_losses(self, batch, outputs):
        """Velodyne-GT depth metrics with the garg crop
        (reference trainer.py:624-652)."""
        depth_pred = np.asarray(outputs["depth/0/0"])[..., 0]
        gt = np.asarray(batch["depth_gt"])
        if gt.ndim == 4:
            gt = gt[..., 0]
        out = {}
        errors = []
        for i in range(gt.shape[0]):
            g = gt[i]
            pred = _np_resize_bilinear(depth_pred[i], g.shape)
            mask = g > 0
            crop_mask = np.zeros_like(mask)
            crop_mask[GARG_CROP[0]:GARG_CROP[1], GARG_CROP[2]:GARG_CROP[3]] = 1
            mask = np.logical_and(mask, crop_mask)
            if not mask.any():
                continue
            p = np.clip(pred[mask], 1e-3, 80)
            gm = g[mask]
            p *= np.median(gm) / np.median(p)
            p = np.clip(p, 1e-3, 80)
            errors.append(compute_errors(gm, p))
        if errors:
            names = ["de/abs_rel", "de/sq_rel", "de/rms", "de/log_rms",
                     "da/a1", "da/a2", "da/a3"]
            for n, v in zip(names, np.mean(errors, axis=0)):
                out[n] = float(v)
        return out

    # ------------------------------------------------------ checkpoints
    def save_model(self):
        folder = os.path.join(self.log_path, "models", f"weights_{self.epoch}")
        save_checkpoint(
            folder, self.state.params, self.state.batch_stats,
            self.state.opt_state,
            height=self.opt.height, width=self.opt.width,
            use_stereo=self.opt.use_stereo,
        )
        print(f"saved model to {folder}")

    def load_model(self):
        folder = self.opt.load_weights_folder
        assert os.path.isdir(folder), f"Cannot find folder {folder}"
        print(f"loading model from folder {folder}")
        if any(f.endswith(".pth") for f in os.listdir(folder)):
            p, s, _ = load_monodepth2_checkpoint(folder)
            params = dict(self.state.params)
            stats = dict(self.state.batch_stats)
            params.update({k: v for k, v in p.items() if k in params})
            stats.update({k: v for k, v in s.items() if k in stats})
            self.state = self.state.replace(params=params, batch_stats=stats)
        else:
            params, stats, opt_state, _ = load_checkpoint(
                folder, self.state.params, self.state.batch_stats,
                self.opt.models_to_load, self.state.opt_state,
            )
            self.state = self.state.replace(
                params=params, batch_stats=stats,
                opt_state=opt_state if opt_state is not None else self.state.opt_state,
            )


def _np_resize_bilinear(img, out_hw):
    from ..eval.depth import _resize_bilinear_np

    return _resize_bilinear_np(img, out_hw)


class Trainer(TrainerBase):
    """Plain monodepth2-style training (config #2 in BASELINE.json)."""

    variant = "mono"


class AttentionTrainer(TrainerBase):
    """rn_encoder_with_attention branch (reference trainer_dpt.py:71-84)."""

    variant = "attention"

    def _build_models(self):
        return build_mono_models(self.opt, attention_encoder=True)


class _FusionTrainerBase(TrainerBase):
    fusion_variant = "pyramid"

    def __init__(self, options: Options):
        # reference trainer forces the 3-frame context (trainer.py:55)
        options.frame_ids = [0, -2, -1, 1]
        super().__init__(options)

    def _frame_idxs(self):
        ids = [0, -1, -2, 1]
        if self.opt.use_stereo:
            ids.append("s")
        return ids

    def _build_models(self):
        return build_fusion_models(self.opt, self.fusion_variant)

    def _init_params(self, rng, inputs):
        return init_fusion_params(self.models, rng, inputs)

    def _make_train_step(self):
        return make_fusion_train_step(self.models)

    def _eval_loss(self, inputs, rng):
        return fusion_loss_fn(self.models, self.state.params,
                              self.state.batch_stats, inputs, rng, train=False)


class FusionTrainer(_FusionTrainerBase):
    """trainer_fusion.py equivalent (pre-disp PixelShuffle Fusion)."""

    fusion_variant = "pyramid"


class FusionV3Trainer(_FusionTrainerBase):
    """trainer_fusion_v3.py equivalent (Fusion_v3 on sigmoid disps).

    Note: the checked-in reference has optimizer stepping commented out
    (trainer_fusion_v3.py:259-261) — a debug snapshot; we optimize."""

    fusion_variant = "v3"

    def _train_files(self):
        # the reference trains v3 from train_files_seq.txt — frames whose
        # +-2 neighbors all exist (trainer_fusion_v3.py:168); fall back to
        # the plain list when the seq list is not vendored.
        path = split_file(self.opt.split, "train")
        seq = path.replace("train_files.txt", "train_files_seq.txt")
        return readlines(seq if os.path.exists(seq) else path)


class FusionScaleLoopTrainer(_FusionTrainerBase):
    """trainer.py equivalent (shared FeatureFusionBlock per scale)."""

    fusion_variant = "scale_loop"


class DPTTrainer(TrainerBase):
    """--model dpt_gru branch: native DPT-hybrid depth (trainer_dpt.py:63-70).

    The reference forces frame_ids to [0, -1, 1] for this model
    (trainer_dpt.py:63) and its DPT emits one full-resolution disparity,
    so the loss runs at scale 0 only.
    """

    variant = "dpt"

    def __init__(self, options: Options):
        options.frame_ids = [0, -1, 1]
        options.scales = [0]
        super().__init__(options)

    def _build_models(self):
        from .steps_dpt import build_dpt_models

        return build_dpt_models(self.opt)

    def _init_params(self, rng, inputs):
        from .steps_dpt import init_dpt_params

        return init_dpt_params(self.models, rng, inputs)

    def _make_train_step(self):
        from .steps_dpt import make_dpt_train_step

        return make_dpt_train_step(self.models)

    def _eval_loss(self, inputs, rng):
        from .steps_dpt import dpt_loss_fn

        return dpt_loss_fn(self.models, self.state.params,
                           self.state.batch_stats, inputs, rng, train=False)
