"""Attention-augmented ResNet encoders in Flax (NHWC).

  * :class:`ResnetEncoderAttention` — standard ResNet backbone with one
    AttentionConv(k=7, groups=8) after each of layer1..4 (reference
    networks/resnet_encoder_attention.py:123-166).
  * :class:`AttentionResNet` — the "stand-alone self-attention" ResNet of
    networks/attention_model.py:131-239: Bottleneck blocks (expansion 1)
    whose mid conv is an AttentionConv; stride handled by a post-block
    avg-pool.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import AttentionConv
from .resnet import ResnetEncoder, _BatchNorm, max_pool_3x3_s2


class ResnetEncoderAttention(nn.Module):
    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = None

    @property
    def num_ch_enc(self) -> Sequence[int]:
        base = [64, 64, 128, 256, 512]
        if self.num_layers > 34:
            return [base[0]] + [c * 4 for c in base[1:]]
        return base

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResnetEncoder(self.num_layers, self.num_input_images,
                              dtype=self.dtype, name="encoder")(x, train)
        out = [feats[0]]
        for i, f in enumerate(feats[1:], start=1):
            att = AttentionConv(f.shape[-1], 7, groups=8, dtype=self.dtype,
                                name=f"atten{i}")(f)
            out.append(att)
        return out


class AttentionBottleneck(nn.Module):
    """attention_model.Bottleneck (expansion=1): 1x1 conv-bn-relu ->
    AttentionConv(k=7, groups=8)-bn-relu -> 1x1 conv-bn; stride applied as
    avg-pool after the block (reference attention_model.py:131-172)."""

    out_channels: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.out_channels
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _BatchNorm(self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = AttentionConv(width, 7, groups=8, dtype=self.dtype,
                            name="atten")(out)
        out = _BatchNorm(self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = _BatchNorm(self.dtype, name="bn3")(out, train)
        if self.stride >= 2:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              (self.stride, self.stride))
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            sc = nn.Conv(self.out_channels, (1, 1),
                         (self.stride, self.stride), use_bias=False,
                         dtype=self.dtype, name="shortcut_conv")(x)
            sc = _BatchNorm(self.dtype, name="shortcut_bn")(sc, train)
        else:
            sc = x
        return nn.relu(out + sc)


class AttentionResNet(nn.Module):
    """attention_model.Model: full self-attention encoder returning the same
    5-feature contract as ResnetEncoder. num_blocks presets: ResNet18
    [2,2,2,2], ResNet26 [1,2,4,1], ResNet38 [2,3,5,2], ResNet50 [3,4,6,3]
    (reference attention_model.py:228-239)."""

    num_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    num_input_images: int = 1
    dtype: Any = None

    num_ch_enc = (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = (x - 0.45) / 0.225
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _BatchNorm(self.dtype, name="bn1")(x, train)
        f0 = nn.relu(x)
        features = [f0]
        x = max_pool_3x3_s2(f0)
        planes = 64
        for stage_idx, n_blocks in enumerate(self.num_blocks):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(n_blocks):
                x = AttentionBottleneck(
                    planes,
                    stride=stride if block_idx == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
            features.append(x)
            planes *= 2
        return features


def AttentionResNet18(**kw):
    """attention_model.ResNet18 preset (reference attention_model.py:228)."""
    return AttentionResNet(num_blocks=(2, 2, 2, 2), **kw)


def AttentionResNet26(**kw):
    return AttentionResNet(num_blocks=(1, 2, 4, 1), **kw)


def AttentionResNet38(**kw):
    return AttentionResNet(num_blocks=(2, 3, 5, 2), **kw)


def AttentionResNet50(**kw):
    return AttentionResNet(num_blocks=(3, 4, 6, 3), **kw)
