"""U-Net depth decoder in Flax.

Re-design of reference ``networks/depth_decoder.py:17-68``: five up-stages
(channels 256..16), nearest-x2 upsample + encoder skip concat, sigmoid
dispconv heads at the requested scales. ``pre_disp=True`` returns the
pre-sigmoid decoder features instead (the hook used by the GRU/fusion
variants, reference depth_decoder.py:62-66).

TPU fast path (default): levels <= SSDE_S2D_DECODER (default 2) run in
the space-to-depth view (ops/s2d) — NHWC's 16/32-channel convs use
12.5/25% of each vector register, and the s2d form quadruples the
channel axis; the nearest-x2 upsample folds into the following conv as
a tap-summed kernel. Decoder fwd+bwd at B=48 640x192 bf16: 46.8 ->
30.8 ms. An opt-in PLANAR ``(B, H, C, W)`` Pallas path
(ops/pallas/conv3x3, SSDE_PLANAR_DECODER=1) also exists — faster at
small batch, launch-bound at B=48. Parameters are identical in every
path, so checkpoints are layout-agnostic.
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


def _s2d_from_level():
    """Largest decoder level that runs in space-to-depth form (-1 = off).

    The s2d view quadruples the channel axis of the wide-spatial /
    narrow-channel top levels (NHWC C=16 uses 12.5% of each vreg/MXU
    pass); measured 3.6-7x per-conv fwd+bwd wins at B=48
    (scripts/microbench_convforms.py). Default: levels <= 2 on TPU;
    off on CPU (XLA:CPU's NHWC convs don't pay the lane penalty).
    """
    v = os.environ.get("SSDE_S2D_DECODER")
    if v is not None:
        return int(v) if v not in ("", "false") else -1
    import jax

    return 2 if jax.default_backend() not in ("cpu",) else -1


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

        from ..ops.s2d import depth_to_space, space_to_depth

        s2d_from = _s2d_from_level()
        if s2d_from >= 0 and any(
            f.shape[1] % 4 or f.shape[2] % 4
            for f in input_features[:s2d_from + 1]
        ):
            s2d_from = -1  # need even s2d-block dims at the converted levels

        x = input_features[-1]
        in_s2d = False  # x is a group-major s2d view
        for i in range(4, -1, -1):
            # upconv_i_0 — s2d form once the chain has converted (the
            # transition level runs it NHWC: its output IS the pre-upsample
            # tensor the fused conv wants, so entry costs no transpose)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x, s2d=in_s2d)
            if i <= s2d_from:
                x_fr = depth_to_space(x) if in_s2d else x
                skip = (space_to_depth(input_features[i - 1].astype(x.dtype))
                        if self.use_skips and i > 0 else None)
                x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                              name=f"upconv_{i}_1")(x_fr, s2d_up=True,
                                                    skip=skip)
                in_s2d = True
            else:
                x = upsample2x_nearest(x)
                if self.use_skips and i > 0:
                    x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
                x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                              name=f"upconv_{i}_1")(x)
            if i in self.scales:
                if pre_disp:
                    outputs[f"disp/{i}"] = depth_to_space(x) if in_s2d else x
                else:
                    d = Conv3x3(self.num_output_channels, dtype=self.dtype,
                                name=f"dispconv_{i}")(x, act="sigmoid",
                                                      s2d=in_s2d)
                    outputs[f"disp/{i}"] = depth_to_space(d) if in_s2d else d
        return outputs
