"""Streaming metric aggregation (reference gru_utils.py:12-72).

numpy-based running averages of the seven depth metrics over a stream of
(prediction, target) pairs — used by the sequence evaluation protocols.
"""

from __future__ import annotations

import numpy as np

from .eval.depth import compute_errors


class MetricAggregator:
    def __init__(self):
        self.reset()

    def reset(self):
        self.count = 0.0
        self.sum_rmse = 0.0
        self.sum_absrel = 0.0
        self.sum_sq_rel = 0.0
        self.sum_rmse_log = 0.0
        self.sum_delta1 = 0.0
        self.sum_delta2 = 0.0
        self.sum_delta3 = 0.0

    def evaluate(self, output, target):
        """Accumulate metrics over valid (target > 0) pixels."""
        output = np.asarray(output)
        target = np.asarray(target)
        mask = target > 0
        if not mask.any():
            return
        abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = compute_errors(
            target[mask], output[mask]
        )
        self.sum_rmse += rmse
        self.sum_absrel += abs_rel
        self.sum_sq_rel += sq_rel
        self.sum_rmse_log += rmse_log
        self.sum_delta1 += a1
        self.sum_delta2 += a2
        self.sum_delta3 += a3
        self.count += 1

    def average(self) -> dict:
        c = max(self.count, 1.0)
        return {
            "rmse": self.sum_rmse / c,
            "absrel": self.sum_absrel / c,
            "sq_rel": self.sum_sq_rel / c,
            "rmse_log": self.sum_rmse_log / c,
            "delta1": self.sum_delta1 / c,
            "delta2": self.sum_delta2 / c,
            "delta3": self.sum_delta3 / c,
        }
