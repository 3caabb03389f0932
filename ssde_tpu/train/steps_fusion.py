"""Jitted train step for the 3-frame attention-fusion trainers.

Covers the reference's three fusion trainers:
  * ``variant="pyramid"`` — trainer_fusion.py: decoder pre-disp features
    -> ``Fusion`` (FeatureFusionBlock_v2 PixelShuffle pyramid), all disps
    at full resolution (trainer_fusion.py:288-305);
  * ``variant="v3"`` — trainer_fusion_v3.py: sigmoid disps -> ``Fusion_v3``
    (trainer_fusion_v3.py:74, fusion call in process_batch);
  * ``variant="scale_loop"`` — trainer.py: sigmoid disps -> one shared
    ``FeatureFusionBlock(features=2)`` applied per scale 3->0 with an
    upsampled carry (trainer.py:339-349).

Frame-axis batching: frames [0, -1, -2] ride the batch axis through one
encoder/decoder pass and are split afterwards (trainer_fusion.py:287-290)
— a reshape, not a copy, under jit. Note trainer.py feeds [-2, -1, 0] and
therefore fuses frame -2 as "current" (trainer.py:293-295 + 315-318); that
is a latent bug in dead code — we use temporal order [0, -1, -2]
everywhere. Pose is predicted for frames [-2, -1, 1]; the photometric loss
uses sources [-1, 1] only (trainer.py:550,558).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..config import Options
from ..data.transforms import preprocess_batch
from .state import jit_step
from ..models import (
    DepthDecoder,
    FeatureFusionBlock,
    Fusion,
    Fusion_v3,
    PoseDecoder,
    ResnetEncoder,
)
from .steps import (
    _apply_bn,
    compute_losses,
    generate_images_pred,
    predict_poses,
)


@dataclasses.dataclass
class FusionModels:
    encoder: Any
    depth: Any
    fusion: Any
    pose_encoder: Any
    pose: Any
    opts: Options
    variant: str  # "pyramid" | "v3" | "scale_loop"

    source_ids = (-1, 1)
    context_ids = (0, -1, -2)


def build_fusion_models(opts: Options, variant: str) -> FusionModels:
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else None
    encoder = ResnetEncoder(opts.num_layers, dtype=dtype)
    depth = DepthDecoder(scales=tuple(opts.scales), dtype=dtype)
    if variant == "pyramid":
        fusion = Fusion(dtype=dtype)
    elif variant == "v3":
        fusion = Fusion_v3(attention=not opts.disable_attention, dtype=dtype)
    elif variant == "scale_loop":
        fusion = FeatureFusionBlock(features=2, dtype=dtype)
    else:
        raise ValueError(variant)
    pose_encoder = ResnetEncoder(opts.num_layers, num_input_images=2, dtype=dtype)
    pose = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2, dtype=dtype)
    return FusionModels(encoder, depth, fusion, pose_encoder, pose, opts, variant)


def init_fusion_params(models: FusionModels, rng, sample_inputs):
    opts = models.opts
    params, batch_stats = {}, {}
    x0 = sample_inputs["color_aug/0/0"]
    keys = jax.random.split(rng, 5)

    v = models.encoder.init(keys[0], x0, True)
    params["encoder"] = v["params"]
    batch_stats["encoder"] = v.get("batch_stats", {})
    feats = models.encoder.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        x0, False,
    )
    pre_disp = models.variant == "pyramid"
    params["depth"] = models.depth.init(keys[1], feats, pre_disp=pre_disp)["params"]
    dec = models.depth.apply({"params": params["depth"]}, feats, pre_disp=pre_disp)

    if models.variant == "scale_loop":
        d3 = dec["disp/3"]
        upt = jnp.zeros_like(d3)
        params["fusion"] = models.fusion.init(keys[2], d3, upt, d3, d3)["params"]
    else:
        params["fusion"] = models.fusion.init(keys[2], dec, dec, dec)["params"]

    pair = jnp.concatenate([x0, x0], axis=-1)
    v = models.pose_encoder.init(keys[3], pair, True)
    params["pose_encoder"] = v["params"]
    batch_stats["pose_encoder"] = v.get("batch_stats", {})
    pfeats = models.pose_encoder.apply(
        {"params": params["pose_encoder"],
         "batch_stats": batch_stats["pose_encoder"]},
        pair, False,
    )
    params["pose"] = models.pose.init(keys[4], [pfeats])["params"]
    return params, batch_stats


def fusion_loss_fn(models: FusionModels, params, batch_stats, inputs, rng,
                   train: bool = True):
    opts = models.opts
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else jnp.float32
    new_bs = dict(batch_stats)

    # one encoder pass over frames [0, -1, -2] on the batch axis
    enc_in = jnp.concatenate(
        [inputs[f"color_aug/{i}/0"] for i in models.context_ids], axis=0
    ).astype(dtype)
    feats, bs = _apply_bn(models.encoder, params["encoder"],
                          batch_stats.get("encoder", {}), enc_in, train=train)
    new_bs["encoder"] = bs

    pre_disp = models.variant == "pyramid"
    dec_all = models.depth.apply({"params": params["depth"]}, feats,
                                 pre_disp=pre_disp)
    B = inputs["color_aug/0/0"].shape[0]
    dec = {k: v[:B] for k, v in dec_all.items()}
    dec_t1 = {k: v[B : 2 * B] for k, v in dec_all.items()}
    dec_t2 = {k: v[2 * B :] for k, v in dec_all.items()}

    if models.variant == "scale_loop":
        outputs = {}
        upt = jnp.zeros_like(dec["disp/3"])
        for s in range(len(opts.scales) - 1, -1, -1):
            outputs[f"disp/{s}"], upt = models.fusion.apply(
                {"params": params["fusion"]},
                dec[f"disp/{s}"], upt, dec_t1[f"disp/{s}"], dec_t2[f"disp/{s}"],
            )
    else:
        outputs = models.fusion.apply({"params": params["fusion"]},
                                      dec, dec_t1, dec_t2)

    pose_out, pose_bs = predict_poses(models, params, batch_stats, inputs, train)
    outputs.update(pose_out)
    new_bs.update(pose_bs)

    outputs = generate_images_pred(inputs, outputs, opts, models.source_ids)
    losses = compute_losses(inputs, outputs, opts, models.source_ids, rng)
    return losses["loss"], (new_bs, losses, outputs)


def make_fusion_train_step(models: FusionModels) -> Callable:
    opts = models.opts

    def step(state, batch, rng):
        inputs = preprocess_batch(
            batch, opts.height, opts.width, opts.num_scales,
            [0, -1, -2, 1], is_train=True,
            pyramid_frames=None if opts.v1_multiscale else [0],
            aug_num_scales=None if opts.v1_multiscale else 1,
        )

        def loss_fn(params):
            return fusion_loss_fn(models, params, state.batch_stats, inputs, rng)

        grads, (new_bs, losses, _) = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), losses

    return jit_step(step)
