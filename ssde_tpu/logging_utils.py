"""Observability: TensorBoard writers + console timing.

Keeps the reference's logging contract (trainer.py:166-168, 654-709):
per-mode SummaryWriters, scalar losses + depth metrics, image panels for
<=4 samples, the ``examples/s`` console line, and the ``opt.json`` dump.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

from .utils import normalize_image, sec_to_hm_str

try:
    from torch.utils.tensorboard import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


class Writers:
    def __init__(self, log_path: str, modes=("train", "val")):
        self.writers = {}
        if SummaryWriter is not None:
            for mode in modes:
                self.writers[mode] = SummaryWriter(os.path.join(log_path, mode))

    def scalars(self, mode: str, step: int, losses: Dict[str, float]):
        w = self.writers.get(mode)
        if w is None:
            return
        for name, value in losses.items():
            w.add_scalar(name, float(value), step)

    def images(self, mode: str, step: int, inputs, outputs, scales, frame_ids,
               max_images: int = 4):
        w = self.writers.get(mode)
        if w is None:
            return
        n = min(max_images, inputs["color/0/0"].shape[0])
        for j in range(n):
            for s in scales:
                for fid in frame_ids:
                    if f"color/{fid}/{s}" in inputs:
                        w.add_image(
                            f"color_{fid}_{s}/{j}",
                            np.transpose(np.asarray(inputs[f"color/{fid}/{s}"][j]), (2, 0, 1)),
                            step,
                        )
                if f"disp/{s}" in outputs:
                    disp = np.asarray(outputs[f"disp/{s}"][j, ..., 0])
                    w.add_image(f"disp_{s}/{j}", normalize_image(disp)[None], step)
                key = f"identity_selection/{s}"
                if key in outputs:
                    w.add_image(
                        f"automask_{s}/{j}",
                        np.asarray(outputs[key][j, ..., 0])[None], step,
                    )

    def close(self):
        for w in self.writers.values():
            w.close()


class TimeLogger:
    """examples/s + ETA console line (reference trainer.py:654-664)."""

    def __init__(self, num_total_steps: int, batch_size: int):
        self.start_time = time.time()
        self.num_total_steps = max(1, num_total_steps)
        self.batch_size = batch_size

    def log(self, step: int, duration: float, loss: float):
        samples_per_sec = self.batch_size / max(duration, 1e-9)
        time_sofar = time.time() - self.start_time
        training_time_left = (
            self.num_total_steps / max(step, 1) - 1.0
        ) * time_sofar if step > 0 else 0
        print(
            "step {:>6} | examples/s: {:5.1f} | loss: {:.5f} | "
            "time elapsed: {} | time left: {}".format(
                step, samples_per_sec, loss,
                sec_to_hm_str(time_sofar), sec_to_hm_str(training_time_left),
            ),
            flush=True,
        )
        return samples_per_sec


def save_opts(log_path: str, opts):
    """Dump the flag namespace to models/opt.json (trainer.py:700-709)."""
    models_dir = os.path.join(log_path, "models")
    os.makedirs(models_dir, exist_ok=True)
    opts.save(os.path.join(models_dir, "opt.json"))
