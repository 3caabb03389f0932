"""ssde_tpu — TPU-native self-supervised depth estimation framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
MariBax/self-supervised-depth-estimation (Monodepth2-style self-supervised
monocular depth with attention-fusion and ConvGRU/ConvLSTM recurrent heads).

Design principles (TPU-first, not a port):
  * NHWC tensor layout everywhere (XLA's preferred conv layout on TPU).
  * Pure-functional modules (flax.linen) composed into jit-compiled train steps.
  * Temporal recurrence via ``jax.lax.scan`` rather than Python loops.
  * Data parallelism via ``jax.sharding.Mesh`` + NamedSharding over ICI
    (the reference's manual per-module ``cuda:N`` placement is subsumed by XLA).
  * Hot self-supervision ops (bilinear warp, photometric SSIM+L1) available
    both as pure-jnp reference implementations and fused Pallas TPU kernels.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SSDE_PLATFORM"):
    # explicit backend override (e.g. SSDE_PLATFORM=cpu for hermetic runs);
    # needed because some TPU plugins ignore the JAX_PLATFORMS env var
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SSDE_PLATFORM"])
