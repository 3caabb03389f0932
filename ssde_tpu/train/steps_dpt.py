"""Jitted train step for the DPT-hybrid depth model (--model dpt_gru).

Re-design of reference trainer_dpt.py:63-70,290-294: the DPT forward
replaces the ResNet encoder + DepthDecoder pair and emits a single
full-resolution ``disp/0``; pose prediction, view synthesis and the
min-reprojection loss are shared with the mono step. The reference's
dpt path cannot run as checked in (external un-vendored ``dpt`` package,
trainer_dpt.py:30); this module trains the native
:class:`~ssde_tpu.models.dpt.DPTDepthModel` end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from ..config import Options
from ..data.transforms import preprocess_batch
from .state import jit_step
from ..models import PoseDecoder, ResnetEncoder
from ..models.dpt import DPTDepthModel
from .steps import _apply_bn, compute_losses, generate_images_pred, predict_poses


@dataclasses.dataclass
class DPTModels:
    dpt: Any
    pose_encoder: Any
    pose: Any
    opts: Options

    @property
    def source_ids(self) -> Sequence:
        ids = [-1, 1]
        if self.opts.use_stereo or "s" in self.opts.frame_ids:
            ids += ["s"]
        return ids


def build_dpt_models(opts: Options) -> DPTModels:
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else None
    dpt = DPTDepthModel(non_negative=True, dtype=dtype)
    pose_encoder = ResnetEncoder(opts.num_layers, num_input_images=2,
                                 dtype=dtype)
    pose = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2,
                       dtype=dtype)
    return DPTModels(dpt, pose_encoder, pose, opts)


def init_dpt_params(models: DPTModels, rng, sample_inputs):
    params, batch_stats = {}, {}
    x0 = sample_inputs["color_aug/0/0"]
    k1, k2, k3 = jax.random.split(rng, 3)

    v = models.dpt.init(k1, x0, True)
    params["dpt"] = v["params"]
    batch_stats["dpt"] = v.get("batch_stats", {})

    pair = jnp.concatenate([x0, x0], axis=-1)
    v = models.pose_encoder.init(k2, pair, True)
    params["pose_encoder"] = v["params"]
    batch_stats["pose_encoder"] = v.get("batch_stats", {})
    pfeats = models.pose_encoder.apply(
        {"params": params["pose_encoder"],
         "batch_stats": batch_stats["pose_encoder"]},
        pair, False,
    )
    params["pose"] = models.pose.init(k3, [pfeats])["params"]
    return params, batch_stats


def dpt_loss_fn(models: DPTModels, params, batch_stats, inputs, rng,
                train: bool = True):
    opts = models.opts
    new_bs = dict(batch_stats)
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else jnp.float32
    x0 = inputs["color_aug/0/0"].astype(dtype)

    outputs, bs = _apply_bn(models.dpt, params["dpt"],
                            batch_stats.get("dpt", {}), x0, train=train)
    new_bs["dpt"] = bs
    outputs = dict(outputs)

    pose_out, pose_bs = predict_poses(models, params, batch_stats, inputs,
                                      train)
    outputs.update(pose_out)
    new_bs.update(pose_bs)

    outputs = generate_images_pred(inputs, outputs, opts, models.source_ids)
    losses = compute_losses(inputs, outputs, opts, models.source_ids, rng)
    return losses["loss"], (new_bs, losses, outputs)


def make_dpt_train_step(models: DPTModels) -> Callable:
    opts = models.opts

    def step(state, batch, rng):
        inputs = preprocess_batch(
            batch, opts.height, opts.width, opts.num_scales,
            [i for i in opts.frame_ids], is_train=True,
            pyramid_frames=[0], aug_num_scales=1,
        )

        def loss_fn(params):
            return dpt_loss_fn(models, params, state.batch_stats, inputs, rng)

        grads, (new_bs, losses, _) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, losses

    return jit_step(step)
