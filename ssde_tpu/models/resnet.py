"""ResNet encoder family in Flax (NHWC), torchvision-compatible structure.

Re-design of the reference's ``networks/resnet_encoder.py`` (ResnetEncoder
:62-98, ResNetMultiImageInput :17-59): same 5-feature-map contract and
``(x - 0.45) / 0.225`` input normalization, but pure-functional NHWC modules
whose parameter tree maps 1:1 onto torchvision checkpoints (see
``ssde_tpu.checkpoint`` for the converter).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_STAGES = {
    18: ([2, 2, 2, 2], "basic"),
    34: ([3, 4, 6, 3], "basic"),
    50: ([3, 4, 6, 3], "bottleneck"),
    101: ([3, 4, 23, 3], "bottleneck"),
    152: ([3, 8, 36, 3], "bottleneck"),
}


def max_pool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1): -inf padded."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _stem_pool(x):
    """Stem maxpool. MEASURED: select_and_scatter stays the default.

    ops/pool.py's packed-argmax pool (one int32 reduce_window forward,
    parity-grouped gather backward) is correct (tests/test_pool.py) but
    measured a NET REGRESSION on the B=48 train step (273 -> 237
    samples/s, 2026-08-21): the int32 window reduce + the parity
    interleave are layout-hostile on TPU, echoing the round-4 finding
    that the shifted-slice maxpool rewrite was 6x worse. Kept opt-in
    (SSDE_FAST_POOL=1) for bf16 non-negative inputs; the default is
    XLA's reduce_window/select_and_scatter pair.
    """
    import os

    if (os.environ.get("SSDE_FAST_POOL") == "1"
            and x.dtype == jnp.bfloat16
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        from ..ops.pool import max_pool_3x3_s2_fast

        return max_pool_3x3_s2_fast(x)
    return max_pool_3x3_s2(x)


class _BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1 torch == 0.9 flax)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), (self.stride, self.stride), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _BatchNorm(self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = _BatchNorm(self.dtype, name="bn2")(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _BatchNorm(self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _BatchNorm(self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), (self.stride, self.stride), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _BatchNorm(self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = _BatchNorm(self.dtype, name="bn3")(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _BatchNorm(self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class ResnetEncoder(nn.Module):
    """ResNet-{18,34,50,101,152} encoder returning 5 feature maps.

    Feature channels: [64, 64, 128, 256, 512] (x4 above layer1 for
    bottleneck variants), matching reference resnet_encoder.py:68,84-85.

    ``num_input_images > 1`` widens conv1 to 3*N input channels (the pose
    encoder's stacked-pair stem, reference :17-59).
    """

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
        if self.num_layers not in _STAGES:
            raise ValueError(f"{self.num_layers} is not a valid number of resnet layers")
        stages, kind = _STAGES[self.num_layers]
        block = BasicBlock if kind == "basic" else Bottleneck

        x = (x - 0.45) / 0.225

        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _BatchNorm(self.dtype, name="bn1")(x, train)
        f0 = nn.relu(x)

        features = [f0]
        x = _stem_pool(f0)
        planes = 64
        for stage_idx, n_blocks in enumerate(stages):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(n_blocks):
                in_ch = x.shape[-1]
                out_ch = planes * (4 if kind == "bottleneck" else 1)
                need_ds = block_idx == 0 and (stride != 1 or in_ch != out_ch)
                x = block(
                    planes,
                    stride=stride if block_idx == 0 else 1,
                    downsample=need_ds,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
            features.append(x)
            planes *= 2
        return features
