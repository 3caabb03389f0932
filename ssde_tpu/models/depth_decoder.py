"""U-Net depth decoder in Flax.

Re-design of reference ``networks/depth_decoder.py:17-68``: five up-stages
(channels 256..16), nearest-x2 upsample + encoder skip concat, sigmoid
dispconv heads at the requested scales. ``pre_disp=True`` returns the
pre-sigmoid decoder features instead (the hook used by the GRU/fusion
variants, reference depth_decoder.py:62-66).

TPU fast path: on non-CPU backends the whole decoder runs in PLANAR
``(B, H, C, W)`` layout through the fused Pallas conv kernel
(ops/pallas/conv3x3) — one entry transpose per encoder feature, one exit
transpose per disp head. XLA's NHWC lowering of these small-channel convs
materializes an im2col (13 GB accessed per B=16 fwd+bwd, measured);
the planar chain keeps the halo in VMEM. Parameters are identical in
both paths, so checkpoints are layout-agnostic.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image import upsample2x_nearest
from .common import Conv3x3, ConvBlock

NUM_CH_DEC = (16, 32, 64, 128, 256)


def _planar_enabled():
    # OPT-IN (SSDE_PLANAR_DECODER=1). Validated on the real chip (parity vs
    # the NHWC path and vs f64 ground truth), and faster at small batch
    # (decoder fwd+bwd 9.5 -> 7.2 ms at B=16) — but the per-(b,h)-row grid
    # does not amortize with batch (B=48: 14.5 vs 28.5 ms, full-step bench
    # 199 -> 158 samples/s), so the XLA path stays the default until the
    # kernel is row/batch-blocked. Interpret-mode tests force it on.
    if os.environ.get("SSDE_PLANAR_DECODER") is not None:
        return os.environ["SSDE_PLANAR_DECODER"] not in ("0", "false")
    return bool(os.environ.get("SSDE_CONV_INTERPRET"))


def _to_planar(x):
    return x.transpose(0, 1, 3, 2)


def _upsample2x_planar(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=3)


class DepthDecoder(nn.Module):
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray], pre_disp: bool = False):
        from ..ops.pallas.conv3x3 import fits_conv3x3

        planar = _planar_enabled() and all(
            fits_conv3x3(f.shape[1], f.shape[2], f.shape[3] + 64,
                         max(NUM_CH_DEC))
            for f in input_features
        )

        outputs = {}
        if planar:
            feats = [_to_planar(f) for f in input_features]
            x = feats[-1]
            for i in range(4, -1, -1):
                x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                              name=f"upconv_{i}_0")(x, planar=True)
                x = _upsample2x_planar(x)
                if self.use_skips and i > 0:
                    x = jnp.concatenate([x, feats[i - 1]], axis=2)
                x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                              name=f"upconv_{i}_1")(x, planar=True)
                if i in self.scales:
                    if pre_disp:
                        outputs[f"disp/{i}"] = x.transpose(0, 1, 3, 2)
                    else:
                        d = Conv3x3(self.num_output_channels, dtype=self.dtype,
                                    name=f"dispconv_{i}")(x, planar=True,
                                                          act="sigmoid")
                        outputs[f"disp/{i}"] = d.transpose(0, 1, 3, 2)
            return outputs

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
