"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-device sharding tests exercise the data-parallel path without TPUs
(the driver separately dry-runs the multi-chip path; see __graft_entry__.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual devices timeshare the host cores: partitions reach each
# collective rendezvous minutes apart on a 1-core box, and XLA:CPU
# SIGABRTs the process at its default ~30 s termination timeout.
if "xla_cpu_collective" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# is what actually pins the CPU backend (and with it the 8 virtual devices
# from --xla_force_host_platform_device_count above).
jax.config.update("jax_platforms", "cpu")

# Exact f32 contractions for golden-value comparison against torch: JAX's
# DEFAULT matmul precision may run f32 matmuls/convs through bf16 passes.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compile cache: XLA:CPU compiles of jitted train steps take
# minutes on this 1-core host; warm cache hits load in seconds.
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ssde_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
