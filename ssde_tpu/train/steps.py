"""Jitted training steps: the self-supervised monodepth core.

One fused XLA program per optimizer step: device-side preprocessing ->
depth + pose forward -> differentiable warp -> min-reprojection/automask
loss -> grads -> Adam. Compare the reference's Python-orchestrated
process_batch (trainer.py:247-373) with manual cross-GPU tensor shuffling;
here placement and gradient reduction are handled by jit + NamedSharding.

Mixed precision: model forward/backward runs in ``compute_dtype``
(bfloat16 by default — MXU native), while the photometric loss, geometry
and parameters stay float32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import Options
from ..data.transforms import preprocess_batch
from .state import jit_step
from ..models import DepthDecoder, PoseCNN, PoseDecoder, ResnetEncoder
from ..models.attention_resnet import ResnetEncoderAttention
from ..ops import (
    disp_to_depth,
    grid_sample,
    reproject_coords,
    resize_bilinear,
    smooth_loss,
    transformation_from_parameters,
)
from ..ops.warp import grid_sample_mxu
from ..ops.losses import photometric_loss, reprojection_loss


@dataclasses.dataclass
class MonoModels:
    """Module bundle for the monodepth2-style trainer."""

    encoder: Any
    depth: Any
    pose_encoder: Optional[Any]
    pose: Any
    opts: Options
    predictive_mask: Optional[Any] = None

    @property
    def source_ids(self) -> Sequence:
        # the reference hard-codes loss/warp sources to [-1, 1] regardless of
        # --frame_ids (trainer.py:550,558); stereo adds "s"
        ids = []
        if any(f not in (0, "s") for f in self.opts.frame_ids):
            ids += [-1, 1]
        if self.opts.use_stereo or "s" in self.opts.frame_ids:
            ids += ["s"]
        return ids


def build_mono_models(opts: Options, attention_encoder: bool = False) -> MonoModels:
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else None
    enc_cls = ResnetEncoderAttention if attention_encoder else ResnetEncoder
    encoder = enc_cls(opts.num_layers, dtype=dtype)
    depth = DepthDecoder(scales=tuple(opts.scales), dtype=dtype)
    num_pose_frames = (
        2 if opts.pose_model_input == "pairs"
        else len([f for f in opts.frame_ids if f != "s"])
    )
    if opts.pose_model_type == "posecnn":
        pose_encoder = None
        pose = PoseCNN(num_input_frames=num_pose_frames, dtype=dtype)
    elif opts.pose_model_type == "shared":
        # monodepthv1-style: pose decoder reads the depth encoder's features
        pose_encoder = None
        pose = PoseDecoder(num_input_features=2, num_frames_to_predict_for=1,
                           dtype=dtype)
    else:
        pose_encoder = ResnetEncoder(opts.num_layers,
                                     num_input_images=num_pose_frames,
                                     dtype=dtype)
        pose = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2,
                           dtype=dtype)
    pred_mask = None
    if opts.predictive_mask:
        # Zhou et al. explainability mask: a second decoder emitting one
        # sigmoid mask channel per source frame (reference trainer.py:141-149)
        assert opts.disable_automasking, (
            "--predictive_mask requires --disable_automasking (reference "
            "trainer.py asserts the same)"
        )
        pred_mask = DepthDecoder(
            scales=tuple(opts.scales),
            num_output_channels=len(opts.frame_ids) - 1,
            dtype=dtype,
        )
    return MonoModels(encoder, depth, pose_encoder, pose, opts, pred_mask)


def init_mono_params(models: MonoModels, rng, sample_inputs):
    """Initialize all params/batch_stats from one preprocessed batch."""
    opts = models.opts
    params, batch_stats = {}, {}
    x0 = sample_inputs["color_aug/0/0"]
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    v = models.encoder.init(k1, x0, True)
    params["encoder"] = v["params"]
    batch_stats["encoder"] = v.get("batch_stats", {})

    feats = models.encoder.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        x0, False,
    )
    params["depth"] = models.depth.init(k2, feats)["params"]
    if models.predictive_mask is not None:
        params["predictive_mask"] = models.predictive_mask.init(k2, feats)["params"]

    n_pose = (
        2 if opts.pose_model_input == "pairs"
        else len([f for f in opts.frame_ids if f != "s"])
    )
    pair = jnp.concatenate([x0] * n_pose, axis=-1)
    if models.pose_encoder is not None:
        v = models.pose_encoder.init(k3, pair, True)
        params["pose_encoder"] = v["params"]
        batch_stats["pose_encoder"] = v.get("batch_stats", {})
        pfeats = models.pose_encoder.apply(
            {"params": params["pose_encoder"],
             "batch_stats": batch_stats["pose_encoder"]},
            pair, False,
        )
        params["pose"] = models.pose.init(k4, [pfeats])["params"]
    elif models.opts.pose_model_type == "shared":
        params["pose"] = models.pose.init(k4, [feats, feats])["params"]
    else:
        params["pose"] = models.pose.init(k4, pair)["params"]
    return params, batch_stats


def _apply_bn(module, params, batch_stats, *args, train: bool):
    """Apply a module that owns BatchNorm state."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mut = module.apply(variables, *args, True, mutable=["batch_stats"])
        return out, mut["batch_stats"]
    return module.apply(variables, *args, False), batch_stats


def predict_poses(models: MonoModels, params, batch_stats, inputs, train: bool,
                  shared_features=None):
    """Per-source-frame SE(3) prediction (reference trainer.py:375-442).

    Pose pairs are ordered temporally — (f, 0) for f<0, (0, f) for f>0 —
    with ``invert=f<0``. The fork hard-codes the temporal sources to
    [-1, 1] regardless of --frame_ids (trainer.py:393); we keep that.

    TPU note: in "pairs" mode both pose pairs ride the batch axis through
    ONE pose-encoder pass (frame-axis batching) instead of two sequential
    passes — with our sync-BN-over-the-global-batch semantics this is
    exactly equivalent modulo BN statistics pooling.

    ``shared_features``: dict frame_id -> encoder feature list, required
    for --pose_model_type shared (features from the depth encoder).
    """
    opts = models.opts
    outputs = {}
    new_bs = {}
    source_frames = [-1, 1]
    num_pose_frames = 2 if opts.pose_model_input == "pairs" else len(
        [f for f in opts.frame_ids if f != "s"])

    def emit(f, aa, t, idx, invert):
        # aa/t: (B, k, 1, 3) as produced by the pose heads; the stored full
        # tensors feed the posecnn re-scaling path in generate_images_pred
        outputs[f"axisangle/0/{f}"] = aa
        outputs[f"translation/0/{f}"] = t
        outputs[f"cam_T_cam/0/{f}"] = transformation_from_parameters(
            aa[:, idx].astype(jnp.float32), t[:, idx].astype(jnp.float32),
            invert=invert,
        )

    if num_pose_frames != 2:
        # all-frames-at-once mode (reference trainer.py:420-442); no invert
        ids = [f for f in opts.frame_ids if f != "s"]
        if opts.pose_model_type == "shared":
            aa, t = models.pose.apply(
                {"params": params["pose"]}, [shared_features[i] for i in ids]
            )
        else:
            stacked = jnp.concatenate(
                [inputs[f"color_aug/{i}/0"] for i in ids], axis=-1
            )
            if models.pose_encoder is not None:
                pfeats, bs = _apply_bn(
                    models.pose_encoder, params["pose_encoder"],
                    batch_stats.get("pose_encoder", {}), stacked, train=train,
                )
                new_bs["pose_encoder"] = bs
                aa, t = models.pose.apply({"params": params["pose"]}, [pfeats])
            else:
                aa, t = models.pose.apply({"params": params["pose"]}, stacked)
        for i, f in enumerate(ids[1:]):
            emit(f, aa, t, idx=i, invert=False)
        return outputs, new_bs

    if opts.pose_model_type == "shared":
        for f in source_frames:
            pose_inputs = (
                [shared_features[f], shared_features[0]] if f < 0
                else [shared_features[0], shared_features[f]]
            )
            aa, t = models.pose.apply({"params": params["pose"]}, pose_inputs)
            emit(f, aa, t, idx=0, invert=(f < 0))
        return outputs, new_bs

    frames = {i: inputs[f"color_aug/{i}/0"] for i in (-1, 0, 1)}
    B = frames[0].shape[0]
    pairs = jnp.concatenate(
        [
            jnp.concatenate([frames[-1], frames[0]], axis=-1),
            jnp.concatenate([frames[0], frames[1]], axis=-1),
        ],
        axis=0,
    )
    if models.pose_encoder is not None:
        pfeats, bs = _apply_bn(
            models.pose_encoder, params["pose_encoder"],
            batch_stats.get("pose_encoder", {}), pairs, train=train,
        )
        new_bs["pose_encoder"] = bs
        aa, t = models.pose.apply({"params": params["pose"]}, [pfeats])
    else:
        aa, t = models.pose.apply({"params": params["pose"]}, pairs)
    for i, f in enumerate(source_frames):
        emit(f, aa[i * B:(i + 1) * B], t[i * B:(i + 1) * B], idx=0,
             invert=(f < 0))
    return outputs, new_bs


def generate_images_pred(inputs, outputs, opts: Options, source_ids):
    """Warp source frames into frame 0 using predicted depth + pose
    (reference trainer.py:465-515).

    All (scale, source) warps sample full-resolution images (the
    non-v1_multiscale path), so the coordinates are computed per pair and
    the bilinear sampling of all S*F pairs runs as ONE batched warp —
    larger MXU matmuls, one kernel instead of eight.
    """
    H, W = opts.height, opts.width
    pairs = []  # (scale, f, src_image, coords)
    for scale in opts.scales:
        disp = outputs[f"disp/{scale}"].astype(jnp.float32)
        if opts.v1_multiscale:
            source_scale = scale
        else:
            if disp.shape[1:3] != (H, W):
                disp = resize_bilinear(disp, (H, W), align_corners=False)
            source_scale = 0
        _, depth = disp_to_depth(disp, opts.min_depth, opts.max_depth)
        outputs[f"depth/0/{scale}"] = depth

        for f in source_ids:
            if f == "s":
                T = inputs["stereo_T"]
            else:
                T = outputs[f"cam_T_cam/0/{f}"]
            if opts.pose_model_type == "posecnn" and f != "s":
                aa = outputs[f"axisangle/0/{f}"].astype(jnp.float32)
                t = outputs[f"translation/0/{f}"].astype(jnp.float32)
                inv_depth = 1.0 / depth
                mean_inv_depth = jnp.mean(inv_depth, axis=(1, 2), keepdims=True)
                T = transformation_from_parameters(
                    aa[:, 0], t[:, 0] * mean_inv_depth[:, 0, 0][:, None], f < 0
                )
            pix = reproject_coords(
                depth,
                inputs[f"inv_K/{source_scale}"].astype(jnp.float32),
                inputs[f"K/{source_scale}"].astype(jnp.float32),
                T,
            )
            outputs[f"sample/{f}/{scale}"] = pix
            src = inputs[f"color/{f}/{source_scale}"].astype(jnp.float32)
            pairs.append((scale, f, src, pix))

    # warp backend selection (see Options.warp_backend). The default TPU
    # training path is the banded lane-gather Pallas kernel ("banded"):
    # one pallas_call per source covering the whole scale family, source
    # resident in VMEM, no HBM one-hot traffic — measured 231 -> 140 ms
    # per B=16 train step vs the XLA one-hot formulation.
    backend = _select_warp_backend(opts)
    if backend in ("family", "banded", "onehot") and not opts.v1_multiscale:
        if backend == "banded":
            from ..ops.pallas.warp_banded import grid_sample_banded as fam
        elif backend == "onehot":
            from ..ops.pallas.warp_onehot import grid_sample_onehot as fam
        else:
            from ..ops.pallas.warp_gather import grid_sample_family as fam

        if backend == "banded":
            vband = max((getattr(opts, "warp_vband", 8) // 8) * 8, 8)
        by_src = {}
        for scale, f, src, pix in pairs:
            by_src.setdefault(f, (src, []))[1].append((scale, pix))
        viol = 0.0
        for f, (src, items) in by_src.items():
            if backend == "banded":
                # planar fast path: the kernel's native (S*B, C, H, W)
                # output feeds the fused photometric kernel directly; the
                # per-scale NHWC views below materialize only if consumed
                # (logging / non-fused loss), so training skips the
                # planar->NHWC->planar round-trip entirely
                from ..ops.pallas.warp_banded import grid_sample_banded_planar

                grids = jnp.stack([pix for _, pix in items], axis=0)
                outs_p = grid_sample_banded_planar(src, grids, vband=vband)
                B = src.shape[0]
                # scale index within outs_p follows opts.scales order
                outputs[f"color_planar/{f}"] = outs_p
                for i, (scale, _) in enumerate(items):
                    outputs[f"color/{f}/{scale}"] = outs_p[
                        i * B:(i + 1) * B].transpose(0, 2, 3, 1)
            else:
                grids = jnp.stack([pix for _, pix in items], axis=1)
                outs = fam(src, grids)
                for i, (scale, _) in enumerate(items):
                    outputs[f"color/{f}/{scale}"] = outs[:, i]
            if backend in ("banded", "onehot"):
                # cheap reduction monitoring the banded kernels'
                # approximation budgets (see warp_banded docstring)
                from ..ops.pallas.warp_banded import band_violation_fraction

                viol = viol + band_violation_fraction(
                    src.shape, grids,
                    vband=vband if backend == "banded" else 40,
                    row_stride=4)
        if backend in ("banded", "onehot"):
            outputs["warp/band_violation"] = viol / len(by_src)
        return outputs

    if backend == "pallas":
        from ..ops.pallas import grid_sample_pallas as sampler
    elif backend in ("mxu", "family", "banded", "onehot"):
        # banded/onehot operate on scale *families*; under --v1_multiscale
        # each scale warps its own-resolution source, so they downgrade to
        # the exact per-pair MXU formulation instead of the slow f32 gather
        sampler = grid_sample_mxu
    else:
        sampler = grid_sample
    for scale, f, src, pix in pairs:
        outputs[f"color/{f}/{scale}"] = sampler(src, pix)
    return outputs


def _photometric_mode(opts: Options, target_shape):
    """Trace-time choice for the batched SSIM+L1 path.

    Returns "" (jnp formulation), "pallas" (fused TPU kernel, measured
    33 -> 6 ms fwd+bwd for the B=16 4-scale family) or "interpret"
    (Pallas interpreter — CPU parity tests via SSDE_PHOTO_INTERPRET=1).
    """
    import os

    if not opts.use_pallas or opts.no_ssim:
        return ""
    from ..ops.pallas.photometric import fits_photometric

    H, W = target_shape[1:3]
    if not fits_photometric(H, W):
        return ""
    if jax.default_backend() == "cpu":
        return "interpret" if os.environ.get("SSDE_PHOTO_INTERPRET") else ""
    return "pallas"


def _select_warp_backend(opts: Options) -> str:
    import os

    backend = os.environ.get("SSDE_WARP_BACKEND", opts.warp_backend)
    if backend != "auto":
        return backend
    if opts.compute_dtype == "bfloat16":
        from ..ops.pallas import pallas_warp_available

        return "banded" if pallas_warp_available() else "mxu"
    return "gather"


def compute_losses(inputs, outputs, opts: Options, source_ids, rng=None):
    """Min-reprojection + automask + smoothness over scales
    (reference trainer.py:517-622).

    TPU scheduling: on the (default) non-v1_multiscale path every scale's
    reprojection loss compares against the same full-res target, so the
    S*F SSIM+L1 maps run as ONE batched call, and the identity
    reprojection losses — which the reference recomputes identically for
    every scale (trainer.py:562-570) — are computed once and shared.
    """
    losses = {}
    total = 0.0
    S = len(opts.scales)
    F = len(source_ids)

    batched = not opts.v1_multiscale
    rep_by_scale = {}
    ident_shared = None
    if batched:
        target0 = inputs["color/0/0"].astype(jnp.float32)
        B = target0.shape[0]
        fused = _photometric_mode(opts, target0.shape)

        def rep(preds, n):
            # (n*B, H, W, 3) stack, batch-fastest -> (n*B, H, W, 1) error
            if fused:
                from ..ops.pallas.photometric import reprojection_loss_pallas

                return reprojection_loss_pallas(
                    preds, target0, interpret=(fused == "interpret")
                )
            return reprojection_loss(
                preds, jnp.tile(target0, (n, 1, 1, 1)), opts.no_ssim
            )

        planar_ok = fused in ("pallas", "interpret") and all(
            f"color_planar/{f}" in outputs for f in source_ids
        )
        if planar_ok:
            # planar fast path: the banded warp already emitted
            # (S*B, C, H, W) scale-major per source — concatenate along G
            # (frame-major: g = (j*S + i)*B + b) and feed the fused kernel
            # directly, skipping the NHWC round-trip. The identity-
            # reprojection maps (raw sources vs target, automask) ride the
            # SAME kernel call as extra G entries instead of a second pass.
            from ..ops.pallas.photometric import photometric_error_planar

            parts = [outputs[f"color_planar/{f}"] for f in source_ids]
            n_warp = F * S
            if not opts.disable_automasking:
                parts += [
                    inputs[f"color/{f}/0"].astype(jnp.float32)
                    .transpose(0, 3, 1, 2)
                    for f in source_ids
                ]
            preds_p = jnp.concatenate(parts, axis=0)
            targ_p = target0.transpose(0, 3, 1, 2)
            rep_all = photometric_error_planar(
                preds_p, targ_p, interpret=(fused == "interpret")
            )[..., None]
            for i, s in enumerate(opts.scales):
                rep_by_scale[s] = jnp.concatenate(
                    [rep_all[(j * S + i) * B:(j * S + i + 1) * B]
                     for j in range(F)],
                    axis=-1,
                )
            if not opts.disable_automasking:
                ident_shared = jnp.concatenate(
                    [rep_all[n_warp * B + j * B:n_warp * B + (j + 1) * B]
                     for j in range(F)],
                    axis=-1,
                )
        else:
            preds_all = jnp.concatenate(
                [outputs[f"color/{f}/{s}"].astype(jnp.float32)
                 for s in opts.scales for f in source_ids],
                axis=0,
            )
            rep_all = rep(preds_all, S * F)
            for i, s in enumerate(opts.scales):
                rep_by_scale[s] = jnp.concatenate(
                    [rep_all[(i * F + j) * B:(i * F + j + 1) * B]
                     for j in range(F)],
                    axis=-1,
                )
        if not opts.disable_automasking and ident_shared is None:
            idents_all = jnp.concatenate(
                [inputs[f"color/{f}/0"].astype(jnp.float32)
                 for f in source_ids],
                axis=0,
            )
            ident_all = rep(idents_all, F)
            ident_shared = jnp.concatenate(
                [ident_all[j * B:(j + 1) * B] for j in range(F)], axis=-1
            )

    for scale in opts.scales:
        source_scale = scale if opts.v1_multiscale else 0
        disp = outputs[f"disp/{scale}"].astype(jnp.float32)
        color = inputs[f"color/0/{scale}"].astype(jnp.float32)
        # fusion variants emit full-resolution disps at every scale; their
        # smoothness image is then the full-res frame (trainer_fusion.py's
        # compute_losses uses source_scale color)
        if disp.shape[1:3] != color.shape[1:3]:
            color = inputs[f"color/0/{source_scale}"].astype(jnp.float32)

        mask_loss = 0.0
        if batched:
            reproj = rep_by_scale[scale]
            if opts.predictive_mask and opts.disable_automasking:
                # Zhou-style explainability mask: weight the reprojection and
                # pull the mask toward 1 with a BCE term (trainer.py:574-588)
                pmask = outputs["predictive_mask"][f"disp/{scale}"].astype(jnp.float32)
                pmask = resize_bilinear(
                    pmask, reproj.shape[1:3], align_corners=False
                )
                reproj = reproj * pmask
                mask_loss = 0.2 * jnp.mean(-jnp.log(jnp.clip(pmask, 1e-7, 1.0)))
            if opts.avg_reprojection:
                reproj = jnp.mean(reproj, axis=-1, keepdims=True)
            if opts.disable_automasking:
                combined = reproj
                n_ident = 0
            else:
                ident = ident_shared
                if opts.avg_reprojection:
                    ident = jnp.mean(ident, axis=-1, keepdims=True)
                if rng is not None:
                    rng, key = jax.random.split(rng)
                    ident = ident + jax.random.normal(
                        key, ident.shape, ident.dtype) * 1e-5
                n_ident = ident.shape[-1]
                combined = jnp.concatenate([ident, reproj], axis=-1)
            if combined.shape[-1] == 1:
                per_pixel = combined
                idxs = jnp.zeros_like(combined, dtype=jnp.int32)
            else:
                per_pixel = jnp.min(combined, axis=-1, keepdims=True)
                idxs = jnp.argmin(combined, axis=-1, keepdims=True)
            mask = ((idxs > n_ident - 1).astype(combined.dtype)
                    if n_ident else jnp.ones_like(per_pixel))
        else:
            target = inputs[f"color/0/{source_scale}"].astype(jnp.float32)
            preds = [outputs[f"color/{f}/{scale}"] for f in source_ids]
            idents = [
                inputs[f"color/{f}/{source_scale}"].astype(jnp.float32)
                for f in source_ids
            ]
            key = None
            if rng is not None and not opts.disable_automasking:
                rng, key = jax.random.split(rng)
            if opts.predictive_mask and opts.disable_automasking:
                pmask = outputs["predictive_mask"][f"disp/{scale}"].astype(jnp.float32)
                reproj = jnp.concatenate(
                    [reprojection_loss(p, target, opts.no_ssim) for p in preds],
                    axis=-1,
                ) * pmask
                mask_loss = 0.2 * jnp.mean(-jnp.log(jnp.clip(pmask, 1e-7, 1.0)))
                if opts.avg_reprojection:
                    reproj = jnp.mean(reproj, axis=-1, keepdims=True)
                per_pixel = (jnp.min(reproj, axis=-1, keepdims=True)
                             if reproj.shape[-1] > 1 else reproj)
                mask = jnp.ones_like(per_pixel)
            else:
                per_pixel, mask = photometric_loss(
                    preds, idents, target, key,
                    no_ssim=opts.no_ssim,
                    disable_automasking=opts.disable_automasking,
                    avg_reprojection=opts.avg_reprojection,
                )
        outputs[f"identity_selection/{scale}"] = mask
        loss = jnp.mean(per_pixel) + mask_loss

        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        norm_disp = disp / (mean_disp + 1e-7)
        loss = loss + opts.disparity_smoothness * smooth_loss(norm_disp, color) / (
            2**scale
        )
        losses[f"loss/{scale}"] = loss
        total = total + loss
    losses["loss"] = total / S
    if "warp/band_violation" in outputs:
        # surfaced in TB scalars; sustained > 0 means the banded warp is
        # approximating — switch to strict/mxu (warp_banded docstring)
        losses["warp/band_violation"] = outputs["warp/band_violation"]
    return losses


def mono_loss_fn(models: MonoModels, params, batch_stats, inputs, rng,
                 train: bool = True):
    """Full forward: encoder -> depth -> poses -> warp -> loss."""
    opts = models.opts
    new_bs = dict(batch_stats)
    x0 = inputs["color_aug/0/0"]
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else jnp.float32
    x0 = x0.astype(dtype)

    shared_features = None
    if opts.pose_model_type == "shared":
        # monodepthv1 shared encoder: all frames through the depth encoder
        # in one frame-axis-batched pass (reference trainer.py:264-278)
        ids = [i for i in opts.frame_ids if i != "s"]
        stacked = jnp.concatenate(
            [inputs[f"color_aug/{i}/0"].astype(dtype) for i in ids], axis=0
        )
        all_feats, bs = _apply_bn(models.encoder, params["encoder"],
                                  batch_stats.get("encoder", {}), stacked,
                                  train=train)
        new_bs["encoder"] = bs
        B = x0.shape[0]
        shared_features = {
            f: [feat[j * B:(j + 1) * B] for feat in all_feats]
            for j, f in enumerate(ids)
        }
        feats = shared_features[0]
    else:
        feats, bs = _apply_bn(models.encoder, params["encoder"],
                              batch_stats.get("encoder", {}), x0, train=train)
        new_bs["encoder"] = bs
    outputs = models.depth.apply({"params": params["depth"]}, feats)
    if models.predictive_mask is not None:
        outputs["predictive_mask"] = models.predictive_mask.apply(
            {"params": params["predictive_mask"]}, feats
        )

    use_pose_net = not (opts.use_stereo and list(opts.frame_ids) == [0])
    if use_pose_net:
        pose_out, pose_bs = predict_poses(models, params, batch_stats, inputs,
                                          train, shared_features=shared_features)
        outputs.update(pose_out)
        new_bs.update(pose_bs)

    outputs = generate_images_pred(inputs, outputs, opts, models.source_ids)
    losses = compute_losses(inputs, outputs, opts, models.source_ids, rng)
    return losses["loss"], (new_bs, losses, outputs)


def make_mono_train_step(models: MonoModels) -> Callable:
    """Build the jitted train step: (state, host_batch, rng) -> (state, losses)."""
    opts = models.opts

    def step(state, batch, rng):
        inputs = preprocess_batch(
            batch, opts.height, opts.width, opts.num_scales,
            [i for i in opts.frame_ids], is_train=True,
            # the loss consumes only frame-0 pyramids and scale-0
            # sources/augs on the standard path; skip the rest
            pyramid_frames=None if opts.v1_multiscale else [0],
            aug_num_scales=None if opts.v1_multiscale else 1,
        )
        # sources [-1,1] must exist even if frame_ids was overridden
        def loss_fn(params):
            return mono_loss_fn(models, params, state.batch_stats, inputs, rng)

        grads, (new_bs, losses, _) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, losses

    return jit_step(step)


def make_mono_infer_fn(models: MonoModels) -> Callable:
    """(params, batch_stats, images) -> disparity at scale 0 (eval mode)."""

    def infer(params, batch_stats, images):
        feats = models.encoder.apply(
            {"params": params["encoder"],
             "batch_stats": batch_stats.get("encoder", {})},
            images, False,
        )
        outputs = models.depth.apply({"params": params["depth"]}, feats)
        return outputs["disp/0"].astype(jnp.float32)

    return jax.jit(infer)
