"""Multi-frame fusion blocks in Flax (NHWC).

Re-design of the reference's three FeatureFusionBlock families:
  * ``FeatureFusionBlock``/``_v2``/``_v3`` + ``Fusion``/``Fusion_v3`` from
    networks/fusion_v2.py (used by trainer.py / trainer_fusion.py /
    trainer_fusion_v3.py) — channel-shared rel attention;
  * ``GRUFusionBlock``/``GRUFusionBlock_v2`` from networks/rnn.py:696-792
    (used inside the ConvGRU blocks) — per-channel rel attention.

Where the reference splits a 3x-concatenated batch
(``v.split(len(v) // 3)``, fusion_v2.py:253-254), our ``Fusion`` modules
take the three per-frame dicts explicitly — the frame-axis batching lives
in the trainer, keeping these modules shape-honest under jit.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.image import pixel_shuffle, pixel_shuffle_planar, resize_bilinear
from .attention import ResidualAttentionUnit
from .common import Conv3x3, ResidualConvUnit


def _rcu(features, attention, shared_rel, dtype, name):
    if attention:
        return ResidualAttentionUnit(features, shared_rel=shared_rel, dtype=dtype,
                                     name=name)
    return ResidualConvUnit(features, dtype=dtype, name=name)


class UpscalePS(nn.Module):
    """conv3x3 -> tanh -> PixelShuffle (reference fusion_v2.py:226-235).

    With ``use_conv=False``: tanh -> PixelShuffle only (the rnn.py variant,
    rnn.py:783-792).
    """

    output_ch: int = 1
    scale: int = 2
    use_conv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, planar: bool = False):
        if self.use_conv:
            assert not planar
            x = nn.Conv(self.output_ch * self.scale**2, (3, 3), padding=1,
                        dtype=self.dtype, name="conv")(x)
        if planar:
            return pixel_shuffle_planar(jnp.tanh(x), self.scale)
        return pixel_shuffle(jnp.tanh(x), self.scale)


class FeatureFusionBlock(nn.Module):
    """fusion_v2.FeatureFusionBlock (reference fusion_v2.py:140-173).

    forward(dt, upt, dt_1, dt_2): rcu1(dt||upt) + rcu2(dt_1||dt_2) -> rcu3
    -> Conv3x3(2->1); returns (out, bilinear-x2-align_corners-up(out)).
    Used by trainer.py's per-scale fusion loop with features=2.
    """

    features: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, dt, upt, dt_1, dt_2):
        f = self.features
        dt_upt = jnp.concatenate([dt, upt], axis=-1)
        context = jnp.concatenate([dt_1, dt_2], axis=-1)
        out = _rcu(f, True, True, self.dtype, "resConfUnit1")(dt_upt)
        out = out + _rcu(f, True, True, self.dtype, "resConfUnit2")(context)
        out = Conv3x3(1, dtype=self.dtype, name="conv3x3")(
            _rcu(f, True, True, self.dtype, "resConfUnit3")(out)
        )
        B, H, W, _ = out.shape
        out_up = resize_bilinear(out, (H * 2, W * 2), align_corners=True)
        return out, out_up


class FeatureFusionBlock_v2(nn.Module):
    """fusion_v2.FeatureFusionBlock_v2 (reference fusion_v2.py:176-223).

    Pre-disp fusion with PixelShuffle upscaling: scale==1 emits Conv3x3
    depth; otherwise UpscalePS heads (depth to full res + features to next
    finer scale). ``init_scale`` adds the 128->256 conv for the coarsest
    block (no ``upt`` yet).
    """

    features: int
    scale: int
    init_scale: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, dt, upt, dt_1, dt_2):
        f = self.features
        if upt is None:
            dt_upt = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                             name="conv_init")(dt)
        else:
            dt_upt = jnp.concatenate([dt, upt], axis=-1)
        context = jnp.concatenate([dt_1, dt_2], axis=-1)
        out = _rcu(f, True, True, self.dtype, "resConfUnit1")(dt_upt)
        out = out + _rcu(f, True, True, self.dtype, "resConfUnit2")(context)
        out = _rcu(f, True, True, self.dtype, "resConfUnit3")(out)
        if self.scale == 1:
            depth = Conv3x3(1, dtype=self.dtype, name="conv3x3")(out)
            return depth, None
        depth = UpscalePS(1, self.scale, dtype=self.dtype, name="upscale_1")(out)
        up = UpscalePS(f // 4, 2, dtype=self.dtype, name="upscale_2")(out)
        return depth, up


class FeatureFusionBlock_v3(nn.Module):
    """fusion_v2.FeatureFusionBlock_v3 (reference fusion_v2.py:279-322).

    2-channel fusion on sigmoid disparities; attention toggleable
    (--disable_attention). ``init_scale`` replaces the upt concat with a
    1->2 conv.
    """

    features: int = 2
    attention: bool = True
    init_scale: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, dt, upt, dt_1, dt_2):
        f = self.features
        if self.init_scale:
            dt_upt = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="conv_1")(dt)
        else:
            dt_upt = jnp.concatenate([dt, upt], axis=-1)
        context = jnp.concatenate([dt_1, dt_2], axis=-1)
        out = jnp.concatenate(
            [
                _rcu(f, self.attention, True, self.dtype, "resConfUnit1")(dt_upt),
                _rcu(f, self.attention, True, self.dtype, "resConfUnit2")(context),
            ],
            axis=-1,
        )
        out = _rcu(f * 2, self.attention, True, self.dtype, "resConfUnit3")(out)
        depth = Conv3x3(1, dtype=self.dtype, name="conv3x3")(out)
        up = UpscalePS(1, 2, dtype=self.dtype, name="upscale")(out)
        return depth, up


class Fusion(nn.Module):
    """Chains 4 FeatureFusionBlock_v2 over pre-disp features, coarse->fine
    (reference fusion_v2.py:239-275). Inputs are per-frame dicts keyed
    'disp/s' of pre-disp decoder features."""

    dtype: Any = None

    @nn.compact
    def __call__(self, dec, dec_t1, dec_t2):
        outputs = {}
        specs = [(256, 8, True), (128, 4, False), (64, 2, False), (32, 1, False)]
        up = None
        for block_idx, (feat, scale, init) in enumerate(specs):
            s = 3 - block_idx
            outputs[f"disp/{s}"], up = FeatureFusionBlock_v2(
                feat, scale, init_scale=init, dtype=self.dtype,
                name=f"fusion_block_{block_idx + 1}",
            )(dec[f"disp/{s}"], up, dec_t1[f"disp/{s}"], dec_t2[f"disp/{s}"])
        return outputs


class Fusion_v3(nn.Module):
    """Chains 4 FeatureFusionBlock_v3 over sigmoid disparities
    (reference fusion_v2.py:325-363)."""

    attention: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, dec, dec_t1, dec_t2):
        outputs = {}
        up = None
        for block_idx in range(4):
            s = 3 - block_idx
            outputs[f"disp/{s}"], up = FeatureFusionBlock_v3(
                2, attention=self.attention, init_scale=(block_idx == 0),
                dtype=self.dtype, name=f"fusion_block_{block_idx + 1}",
            )(dec[f"disp/{s}"], up, dec_t1[f"disp/{s}"], dec_t2[f"disp/{s}"])
        return outputs


class GRUFusionBlock(nn.Module):
    """rnn.FeatureFusionBlock (reference rnn.py:696-737): rcu1(i1)+rcu2(i2)
    -> rcu3 -> Conv3x3(2->1) -> sigmoid; optional bilinear x2 up output."""

    features: int
    up: bool = True
    attention: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_1, input_2):
        f = self.features
        out = _rcu(f, self.attention, False, self.dtype, "resConfUnit1")(input_1)
        out = out + _rcu(f, self.attention, False, self.dtype, "resConfUnit2")(input_2)
        out = nn.sigmoid(
            Conv3x3(1, dtype=self.dtype, name="conv3x3")(
                _rcu(f, self.attention, False, self.dtype, "resConfUnit3")(out)
            )
        )
        if self.up:
            B, H, W, _ = out.shape
            return out, resize_bilinear(out, (H * 2, W * 2), align_corners=True)
        return out


class GRUFusionBlock_v2(nn.Module):
    """rnn.FeatureFusionBlock_v2 (reference rnn.py:739-779):
    pre = rcu1(i1) + i2; out = sigmoid(Conv3x3(rcu2(pre)));
    up output = PixelShuffle(tanh(pre)) (no conv)."""

    features: int
    up: bool = True
    attention: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_1, input_2, planar: bool = False, wl: int = 0):
        f = self.features
        if planar:
            # chain-padded planar fast path: inputs (B, H, C, W) with
            # logical width wl; disp returns NHWC, `up` returns PLANAR at
            # logical width 2*wl. Attention units run the planar
            # AttentionConv path (planar 1x1 matmuls + the fused kernel).
            wl = wl or input_1.shape[3]
            pre = _rcu(f, self.attention, False, self.dtype,
                       "resConfUnit1")(input_1, planar=True, wl=wl)
            pre = pre + input_2
            r2 = _rcu(f, self.attention, False, self.dtype,
                      "resConfUnit2")(pre, planar=True, wl=wl)
            if wl != r2.shape[3]:
                r2 = r2[..., :wl]
            out = Conv3x3(1, dtype=self.dtype, name="conv3x3")(
                r2, planar=True, act="sigmoid").transpose(0, 1, 3, 2)
            if self.up:
                return out, UpscalePS(use_conv=False, scale=2,
                                      dtype=self.dtype, name="upscale")(
                    nn.relu(pre), planar=True)
            return out
        pre = _rcu(f, self.attention, False, self.dtype, "resConfUnit1")(input_1)
        pre = pre + input_2
        out = nn.sigmoid(
            Conv3x3(1, dtype=self.dtype, name="conv3x3")(
                _rcu(f, self.attention, False, self.dtype, "resConfUnit2")(pre)
            )
        )
        if self.up:
            # resConfUnit2's inplace relu has mutated `pre` by the time the
            # reference calls upscale (rnn.py:766-773): up sees relu(pre)
            return out, UpscalePS(use_conv=False, scale=2, dtype=self.dtype,
                                  name="upscale")(nn.relu(pre))
        return out
