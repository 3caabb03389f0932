"""Stateful evaluation runners for the recurrent (GRU) models.

Re-design of reference ``evaluate_depth_gru_fusion.py`` /
``evaluate_depth_gru_fusion_my_v.py``: three protocols over all GRU
versions, sharing one jitted per-frame step with carried hidden state:

  * single-image      — fresh h0 per test image
                        (reference evaluate_v3_single_image, :88-136)
  * warm-up           — run <=N previous frames of the scene through the
                        recurrence, then predict the test frame
                        (evaluate_v3_seq_prev_images, :140-199;
                        evaluate_v4_seq_prev_images, :357-438)
  * scene-streaming   — carry hidden across an entire ordered scene,
                        emitting a depth per frame
                        (evaluate_v4_seq :297-354, v5 :504-554, v7
                        :246-292, v8 :557-618)

Variable-length scenes don't fight jit: the per-frame step has a fixed
(B=1) shape and is jitted once; the scene loop runs on the host.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..models import ConvGRUBlocks
from ..train.steps import _apply_bn
from ..train.steps_gru import HEAD_VERSIONS, PRE_DISP_VERSIONS, GRUModels


class GRUStreamEvaluator:
    """Carries recurrent state across frames; emits scale-0 scaled disparity."""

    def __init__(self, models: GRUModels, params, batch_stats):
        self.models = models
        self.params = params
        self.batch_stats = batch_stats
        self.opts = models.opts
        self.version = self.opts.gru_version
        self._step = jax.jit(self._make_step())

    # carry = (hidden, hidden_prev) — hidden_prev only used by v4/v7-style
    def initial_carry(self, batch_size: int = 1):
        h0 = self.models.gru.apply(
            {"params": self.params["gru"]}, batch_size,
            method=ConvGRUBlocks.initial_state,
        )
        return (h0, h0)

    def _make_step(self):
        models, opts = self.models, self.opts
        version = self.version

        def step(params, batch_stats, carry, image):
            hidden, hidden_prev = carry
            feats = models.encoder.apply(
                {"params": params["encoder"],
                 "batch_stats": batch_stats.get("encoder", {})},
                image, False,
            )
            if version == "v5":
                h_new, _ = models.gru.apply({"params": params["gru"]}, feats, hidden)
                fused = [f + (h + hn) / 2 for f, h, hn in zip(feats, hidden, h_new)]
                dec = models.depth.apply({"params": params["depth"]}, fused)
                return (h_new, hidden), dec["disp/0"]

            pre_disp = version in PRE_DISP_VERSIONS and bool(opts.gru_pre_disp)
            dec = models.depth.apply({"params": params["depth"]}, feats,
                                     pre_disp=pre_disp)

            if version in ("v4", "v6"):
                h_new, _ = models.gru.apply({"params": params["gru"]}, dec, hidden)
                outputs = {
                    f"disp/{s}": dec[f"disp/{s}"] + (h_new[s] + hidden[s]) / 2
                    for s in range(4)
                }
                disp = models.head.apply({"params": params["head"]}, outputs,
                                         zero_scale_only=True)["disp/0"]
                return (h_new, hidden), disp

            if version == "v7":
                h_in = [(c + p) / 2 for c, p in zip(hidden, hidden_prev)]
                h_new, _ = models.gru.apply({"params": params["gru"]}, dec, h_in)
                disp = models.head.apply(
                    {"params": params["head"]}, [h_new[s] for s in range(4)],
                    zero_scale_only=True,
                )["disp/0"]
                return (h_new, hidden), disp

            h_new, disp = models.gru.apply({"params": params["gru"]}, dec, hidden)
            return (h_new, hidden), disp["disp/0"]

        return step

    def predict_single(self, image: np.ndarray) -> np.ndarray:
        """Fresh h0, one frame -> (H, W) sigmoid disparity."""
        carry = self.initial_carry(image.shape[0])
        _, disp = self._step(self.params, self.batch_stats, carry,
                             jnp.asarray(image))
        return np.asarray(disp)[..., 0]

    def predict_with_warmup(self, prev_frames: List[np.ndarray],
                            image: np.ndarray) -> np.ndarray:
        """Warm the recurrence on previous frames, then predict."""
        carry = self.initial_carry(image.shape[0])
        for f in prev_frames:
            carry, _ = self._step(self.params, self.batch_stats, carry,
                                  jnp.asarray(f))
        _, disp = self._step(self.params, self.batch_stats, carry,
                             jnp.asarray(image))
        return np.asarray(disp)[..., 0]

    def predict_scene(self, frames) -> List[np.ndarray]:
        """Stream a whole ordered scene, emitting one disparity per frame."""
        out = []
        carry = None
        for f in frames:
            f = np.asarray(f)
            if carry is None:
                carry = self.initial_carry(f.shape[0])
            carry, disp = self._step(self.params, self.batch_stats, carry,
                                     jnp.asarray(f))
            out.append(np.asarray(disp)[..., 0])
        return out
