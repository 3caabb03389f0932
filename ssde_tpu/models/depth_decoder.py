"""U-Net depth decoder in Flax (NHWC).

Re-design of reference ``networks/depth_decoder.py:17-68``: five up-stages
(channels 256..16), nearest-x2 upsample + encoder skip concat, sigmoid
dispconv heads at the requested scales. ``pre_disp=True`` returns the
pre-sigmoid decoder features instead (the hook used by the GRU/fusion
variants, reference depth_decoder.py:62-66).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.image import upsample2x_nearest
from .common import Conv3x3, ConvBlock

NUM_CH_DEC = (16, 32, 64, 128, 256)


class DepthDecoder(nn.Module):
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray], pre_disp: bool = False):
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                if pre_disp:
                    outputs[f"disp/{i}"] = x
                else:
                    outputs[f"disp/{i}"] = nn.sigmoid(
                        Conv3x3(self.num_output_channels, dtype=self.dtype,
                                name=f"dispconv_{i}")(x)
                    )
        return outputs
