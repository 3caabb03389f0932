"""Pose networks in Flax (NHWC).

PoseDecoder: squeeze 1x1 + 3 convs -> global mean -> 0.01x (axisangle,
translation) (reference networks/pose_decoder.py:14-54).
PoseCNN: 7-conv stride-2 stack straight from stacked RGB
(reference networks/pose_cnn.py:13-50).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class PoseDecoder(nn.Module):
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2
    stride: int = 1

    dtype: Any = None

    @nn.compact
    def __call__(self, input_features: Sequence[Sequence[jnp.ndarray]]):
        """input_features: list (per image) of encoder feature lists."""
        last_features = [f[-1] for f in input_features]
        # ONE shared squeeze conv applied to every input feature (the
        # reference registers a single convs["squeeze"], pose_decoder.py:26,44)
        squeeze = nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")
        cat = jnp.concatenate(
            [nn.relu(squeeze(f)) for f in last_features], axis=-1
        )
        out = cat
        for i in range(3):
            k = 3 if i != 2 else 1
            ch = 256 if i != 2 else 6 * self.num_frames_to_predict_for
            out = nn.Conv(
                ch, (k, k), (self.stride, self.stride) if i != 2 else (1, 1),
                padding=1 if i != 2 else 0, dtype=self.dtype, name=f"pose_{i}",
            )(out)
            if i != 2:
                out = nn.relu(out)

        out = jnp.mean(out, axis=(1, 2))  # global average over H, W
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    num_input_frames: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        specs = [(16, 7, 2, 3), (32, 5, 2, 2), (64, 3, 2, 1), (128, 3, 2, 1),
                 (256, 3, 2, 1), (256, 3, 2, 1), (256, 3, 2, 1)]
        for i, (ch, k, s, p) in enumerate(specs):
            x = nn.Conv(ch, (k, k), (s, s), padding=p, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(6 * (self.num_input_frames - 1), (1, 1), dtype=self.dtype,
                    name="pose_conv")(x)
        x = jnp.mean(x, axis=(1, 2))
        out = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return out[..., :3], out[..., 3:]
