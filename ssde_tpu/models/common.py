"""Shared Flax building blocks (NHWC).

The reference duplicates Conv3x3 / ResidualConvUnit across six files
(layers.py:106-136, networks/rnn.py:14-29, networks/fusion_v2.py:11-43);
here each exists once, parameterized.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Conv3x3(nn.Module):
    """Reflection-pad(1) + VALID 3x3 conv (reference layers.py:121-136).

    Reflection padding is load-bearing for checkpoint parity with the
    reference; ``use_refl=False`` selects zero padding.
    """

    out_channels: int
    use_refl: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mode = "reflect" if self.use_refl else "constant"
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        return nn.Conv(
            self.out_channels, (3, 3), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (reference layers.py:106-118)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv3x3(self.out_channels, dtype=self.dtype, name="conv")(x)
        return nn.elu(x)


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv + skip (reference networks/fusion_v2.py:11-43)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # inplace-relu aliasing in the reference: the residual adds relu(x),
        # not x (fusion_v2.py:29-43) — kept for checkpoint parity
        r = nn.relu(x)
        out = nn.Conv(
            self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1"
        )(r)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2"
        )(out)
        return out + r
