"""Jitted train step for recurrent (ConvGRU/ConvLSTM) sequence training.

Re-design of reference ``trainer_gru.py`` run_gru_v2..v10
(trainer_gru.py:350-764): the T-step Python loop becomes ``jax.lax.scan``
over the time axis with the GRU block as the scanned cell, and the whole
sequence step (encoder over B*T frames -> scan -> warp -> loss -> grads)
is one XLA program.

Correctness notes vs the reference:
  * the reference mixes B-major (GRU outputs, trainer_gru.py:397-399) and
    T-major (poses/colors, :817-820) flattenings and is therefore only
    consistent for batch_size 1 (v5/v7 say so explicitly, :596,650). We
    flatten B-major everywhere, correct for any batch size.
  * the per-timestep inputs/losses flow through the same
    generate_images_pred / compute_losses as the mono step, on the
    flattened (B*T) batch — exactly the reference's "batch the time axis"
    trick (trainer_gru.py:356-364) without the device shuffling.
  * v7's "fusion before gru" (h_curr + h_prev)/2 (trainer_gru.py:689-697)
    is carried as a (h_curr, h_prev) scan state.
  * scan bodies (and the B*T-frame encoder/decoder) are rematerialized
    (jax.checkpoint) when B*T is large so T=10 full-res hidden states
    don't blow HBM during backward; small sequence batches skip remat
    and save the forward recompute (``--gru_remat auto|0|1``).
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
    ConvGRUBlocks,
    DepthDecoder,
    Head,
    PoseDecoder,
    ResnetEncoder,
    make_gru,
)
from .steps import _apply_bn, compute_losses, generate_images_pred, predict_poses

HEAD_VERSIONS = {"v4": (16, 32, 64, 128), "v6": (16, 32, 64, 128),
                 "v7": (32, 64, 128, 256)}
PRE_DISP_VERSIONS = {"v3", "v4", "v6", "v7", "v8", "v9", "v10"}


def _remat_mode(opts: Options) -> str:
    """Which parts of the sequence step to rematerialize in the backward.

    Modes: "scan" (scan body only), "1" (everything), "0" (nothing),
    "auto". With attention in the fusion blocks the scan body MUST
    remat: the windowed-attention kernel saves its 9 softmax weights as
    a residual (686 MB per call at scale 0), and stacking them over
    4 units x 4 scales x T measured 38.8 GB at B=8,T=3 (16 GB chip).
    Attention-free versions (v10 / --disable_attention) fit without the
    scan remat since the planar chain removed the 4x lane padding of
    the NHWC small-channel tensors — skipping it saves the scan body's
    forward recompute (v10 B=8,T=3: 91.6 -> 101.5 frame-samples/s).
    The B*T-frame encoder/decoder remat is only needed when B*T is
    large; skipping it saves their forward recompute.
    """
    mode = str(getattr(opts, "gru_remat", "auto"))
    if mode == "auto":
        bt = opts.batch_size * opts.len_sequence
        if bt <= 24:
            # attention versions skip the scan remat too: gru_loss_fn
            # wraps the unroll in remat_attention(), so the softmax
            # residuals are transient even without a body remat (v9
            # B=8,T=3 measured 52 -> see PLAN.md round 4)
            return "0"
        return "scan" if bt <= 32 else "1"
    if mode in ("0", "false", "False"):
        return "0"
    if mode in ("1", "true", "True"):
        return "1"
    return mode


def _maybe_remat(fn, opts: Options, part: str = "encdec"):
    mode = _remat_mode(opts)
    remat = mode == "1" or (mode == "scan" and part == "scan")
    return jax.checkpoint(fn) if remat else fn


@dataclasses.dataclass
class GRUModels:
    encoder: Any
    depth: Any
    gru: ConvGRUBlocks
    head: Optional[Head]
    pose_encoder: Any
    pose: Any
    opts: Options

    source_ids = (-1, 1)


def build_gru_models(opts: Options) -> GRUModels:
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else None
    encoder = ResnetEncoder(opts.num_layers, dtype=dtype)
    depth = DepthDecoder(scales=tuple(opts.scales), dtype=dtype)
    gru = make_gru(opts.gru_version, opts.height, opts.width,
                   attention=not opts.disable_attention, dtype=dtype)
    head = None
    if opts.gru_version in HEAD_VERSIONS:
        head = Head(channels=HEAD_VERSIONS[opts.gru_version], dtype=dtype)
    pose_encoder = ResnetEncoder(opts.num_layers, num_input_images=2, dtype=dtype)
    pose = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2,
                       dtype=dtype)
    return GRUModels(encoder, depth, gru, head, pose_encoder, pose, opts)


def preprocess_gru_batch(batch, opts: Options, is_train: bool = True):
    """(B, T, H, W, 3) sequence batch -> flattened (B*T) mono-style inputs."""
    flat = {}
    B, T = batch["color/0"].shape[:2]
    for i in (0, -1, 1):
        x = batch[f"color/{i}"]
        flat[f"color/{i}"] = x.reshape((B * T,) + x.shape[2:])
    flat["K"] = jnp.repeat(batch["K"], T, axis=0)
    if "jitter" in batch:
        flat["jitter"] = jnp.repeat(batch["jitter"], T, axis=0)
    inputs = preprocess_batch(flat, opts.height, opts.width, opts.num_scales,
                              [0, -1, 1], is_train=is_train,
                              pyramid_frames=None if opts.v1_multiscale else [0],
                              aug_num_scales=None if opts.v1_multiscale else 1)
    return inputs, B, T


def _to_time_major(x, B, T):
    return x.reshape((B, T) + x.shape[1:]).swapaxes(0, 1)


def _to_flat(x, B, T):
    return x.swapaxes(0, 1).reshape((B * T,) + x.shape[2:])


def gru_unroll(models: GRUModels, params, dec_or_feats, B: int, T: int):
    """Version-dispatched lax.scan over the time axis.

    Input: per-scale decoder outputs (or encoder features for v5) with
    flattened (B*T) batch. Returns dict 'disp/s' -> (B*T, h, w, 1).
    """
    opts = models.opts
    version = opts.gru_version
    gru_params = {"params": params["gru"]}
    h0 = models.gru.apply(gru_params, B, method=ConvGRUBlocks.initial_state)
    if opts.compute_dtype == "bfloat16":
        # carry the hidden state in bf16: halves the scan carry's HBM
        # traffic at full resolution and keeps cell convs on the MXU's
        # native dtype. h0 params stay f32 (optimizer side).
        h0 = jax.tree.map(lambda t: t.astype(jnp.bfloat16), h0)

    if version == "v5":
        feats_t = [_to_time_major(f, B, T) for f in dec_or_feats]

        def step(h, feats):
            h_new, _ = models.gru.apply(gru_params, list(feats), h)
            return h_new, h_new

        _, h_seq = jax.lax.scan(_maybe_remat(step, opts, 'scan'), h0, tuple(feats_t))
        # prepend h0, temporal fusion (h[t] + h[t+1]) / 2 added to features
        fused = []
        for s in range(5):
            hs = jnp.concatenate([h0[s][None], h_seq[s]], axis=0)  # (T+1, B, ...)
            mix = (hs[1:] + hs[:-1]) / 2
            fused.append(dec_or_feats[s] + _to_flat(mix, B, T))
        return models.depth.apply({"params": params["depth"]}, fused)

    dec_t = {k: _to_time_major(v, B, T) for k, v in dec_or_feats.items()}

    if version in ("v1", "v2", "v2_wo_att", "v3", "v8", "v9", "v10"):

        def step(h, dec):
            h_new, disp = models.gru.apply(gru_params, dec, h)
            return h_new, disp

        _, disp_seq = jax.lax.scan(_maybe_remat(step, opts, 'scan'), h0, dec_t)
        return {k: _to_flat(v, B, T) for k, v in disp_seq.items()}

    if version in ("v4", "v6"):

        def step(h, dec):
            h_new, _ = models.gru.apply(gru_params, dec, h)
            return h_new, h_new

        _, h_seq = jax.lax.scan(_maybe_remat(step, opts, 'scan'), h0, dec_t)
        outputs = {}
        for s in range(4):
            hs = jnp.concatenate([h0[s][None], h_seq[s]], axis=0)
            mix = (hs[1:] + hs[:-1]) / 2  # --fuse aggregation
            outputs[f"disp/{s}"] = dec_or_feats[f"disp/{s}"] + _to_flat(mix, B, T)
        return models.head.apply({"params": params["head"]}, outputs)

    if version == "v7":

        def step(carry, dec):
            h_curr, h_prev = carry
            h_in = [(c + p) / 2 for c, p in zip(h_curr, h_prev)]
            h_new, _ = models.gru.apply(gru_params, dec, h_in)
            return (h_new, h_curr), h_new

        _, h_seq = jax.lax.scan(_maybe_remat(step, opts, 'scan'), (h0, h0), dec_t)
        outputs = [_to_flat(h_seq[s], B, T) for s in range(4)]
        return models.head.apply({"params": params["head"]}, outputs)

    raise ValueError(f"unsupported gru version {version!r}")


def gru_loss_fn(models: GRUModels, params, batch_stats, inputs, B, T, rng,
                train: bool = True):
    opts = models.opts
    dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" else jnp.float32
    new_bs = dict(batch_stats)

    x = inputs["color_aug/0/0"].astype(dtype)  # (B*T, H, W, 3)

    # remat the B*T-frame encoder (and decoder): the sequence step's
    # activation footprint is T x the mono step's — without remat, B=8,T=3
    # at 640x192 already exceeds 16 GB HBM
    def enc_fn(p, bs_in, xx):
        return _apply_bn(models.encoder, p, bs_in, xx, train=train)

    feats, bs = _maybe_remat(enc_fn, opts)(
        params["encoder"], batch_stats.get("encoder", {}), x
    )
    new_bs["encoder"] = bs

    # attention fusion blocks: rematerialize each fused-attention call so
    # its softmax residuals never stack over T (models/attention.py
    # remat_attention) — this is what lets the auto remat policy skip the
    # whole-scan-body remat for v9 like it does for v10
    from ..models.attention import remat_attention

    with remat_attention():
        if opts.gru_version == "v5":
            outputs = gru_unroll(models, params, feats, B, T)
        else:
            pre_disp = (opts.gru_version in PRE_DISP_VERSIONS
                        and bool(opts.gru_pre_disp))

            def dec_fn(p, fs):
                return models.depth.apply({"params": p}, fs, pre_disp=pre_disp)

            dec = _maybe_remat(dec_fn, opts)(params["depth"], feats)
            outputs = gru_unroll(models, params, dec, B, T)

    pose_out, pose_bs = predict_poses(models, params, batch_stats, inputs, train)
    outputs.update(pose_out)
    new_bs.update(pose_bs)

    outputs = generate_images_pred(inputs, outputs, opts, models.source_ids)
    losses = compute_losses(inputs, outputs, opts, models.source_ids, rng)
    return losses["loss"], (new_bs, losses, outputs)


def init_gru_params(models: GRUModels, rng, batch):
    """Initialize all modules from one (small) sequence batch."""
    opts = models.opts
    inputs, B, T = preprocess_gru_batch(batch, opts, is_train=False)
    params, batch_stats = {}, {}
    keys = jax.random.split(rng, 6)

    x = inputs["color_aug/0/0"]
    v = models.encoder.init(keys[0], x, True)
    params["encoder"] = v["params"]
    batch_stats["encoder"] = v.get("batch_stats", {})
    feats = models.encoder.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        x, False,
    )

    pre_disp = opts.gru_version in PRE_DISP_VERSIONS and bool(opts.gru_pre_disp)
    params["depth"] = models.depth.init(keys[1], feats, pre_disp=pre_disp)["params"]
    dec = models.depth.apply({"params": params["depth"]}, feats, pre_disp=pre_disp)

    if opts.gru_version == "v5":
        zeros = [jnp.zeros((B,) + f.shape[1:-1] + (f.shape[-1],)) for f in feats]
        one_t = [f.reshape((B, T) + f.shape[1:])[:, 0] for f in feats]
        params["gru"] = models.gru.init(keys[2], one_t, zeros)["params"]
    else:
        one_t = {k: v.reshape((B, T) + v.shape[1:])[:, 0] for k, v in dec.items()}
        from ..models.recurrent import GRU_HIDDEN_SPECS, _gru_planar_cfg

        spec = GRU_HIDDEN_SPECS[opts.gru_version if opts.gru_version != "v6" else "v4"]
        planar_cfg = _gru_planar_cfg(opts.gru_version, opts.height,
                                     opts.width, not opts.disable_attention,
                                     len(spec["hid"]))
        zeros = []
        for s, hid in enumerate(spec["hid"]):
            div = 2**s
            # layout must match ConvGRUBlocks.initial_state: planar scales
            # carry chain-padded (B, H, C, wp) hidden states
            if planar_cfg[s][0]:
                shape = (B, opts.height // div, hid, planar_cfg[s][1])
            else:
                shape = (B, opts.height // div, opts.width // div, hid)
            if spec["cell"] == "lstm":
                zeros.append((jnp.zeros(shape), jnp.zeros(shape)))
            else:
                zeros.append(jnp.zeros(shape))
        params["gru"] = models.gru.init(keys[2], one_t, zeros)["params"]
        if models.head is not None:
            if opts.gru_version == "v7":
                h_like = [
                    jnp.zeros((B, opts.height // 2**s, opts.width // 2**s, c))
                    for s, c in enumerate(HEAD_VERSIONS["v7"])
                ]
                params["head"] = models.head.init(keys[3], h_like)["params"]
            else:
                params["head"] = models.head.init(keys[3], one_t)["params"]

    pair = jnp.concatenate([x, x], axis=-1)
    v = models.pose_encoder.init(keys[4], pair, True)
    params["pose_encoder"] = v["params"]
    batch_stats["pose_encoder"] = v.get("batch_stats", {})
    pfeats = models.pose_encoder.apply(
        {"params": params["pose_encoder"],
         "batch_stats": batch_stats["pose_encoder"]},
        pair, False,
    )
    params["pose"] = models.pose.init(keys[5], [pfeats])["params"]
    return params, batch_stats


def make_gru_train_step(models: GRUModels) -> Callable:
    opts = models.opts

    def step(state, batch, rng):
        inputs, B, T = preprocess_gru_batch(batch, opts, is_train=True)

        def loss_fn(params):
            return gru_loss_fn(models, params, state.batch_stats, inputs, B, T, rng)

        grads, (new_bs, losses, _) = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), losses

    return jit_step(step)
