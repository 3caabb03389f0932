"""Tensor-parallel (model-axis) capability on the virtual CPU mesh.

The reference spans a model over several GPUs by manual per-module
placement (trainer.py:44-111); here the same capability is a second mesh
axis + channel-sharded kernels, with XLA SPMD inserting the collectives.
This test proves a model-parallel forward+backward produces the same
numbers as the unsharded module."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from ssde_tpu.models import DepthDecoder, ResnetEncoder
from ssde_tpu.parallel import (
    DATA_AXIS,
    batch_sharding,
    make_mesh_2d,
    model_sharded_params,
)


@pytest.mark.slow  # two jitted fwd+bwd compiles (plain + SPMD-partitioned)
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_model_parallel_matches_unsharded():
    B, H, W = 2, 32, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    enc = ResnetEncoder(18)
    dec = DepthDecoder(scales=(0,))
    ev = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(ev, x, False)
    dv = dec.init(jax.random.PRNGKey(1), feats)

    def loss_fn(ep, dp, x):
        feats = enc.apply({"params": ep, "batch_stats": ev["batch_stats"]},
                          x, False)
        disp = dec.apply({"params": dp}, feats)["disp/0"]
        return jnp.mean(disp ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    ref_loss, (ref_ge, ref_gd) = grad_fn(ev["params"], dv["params"], x)

    mesh = make_mesh_2d(data=2, model=2)
    ep_s = model_sharded_params(ev["params"], mesh)
    dp_s = model_sharded_params(dv["params"], mesh)
    x_s = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    mp_loss, (mp_ge, mp_gd) = grad_fn(ep_s, dp_s, x_s)

    np.testing.assert_allclose(float(ref_loss), float(mp_loss), rtol=1e-5)
    for ref, got in ((ref_ge, mp_ge), (ref_gd, mp_gd)):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3),
            ref, got,
        )
    # the kernels really are sharded over the model axis
    k = mp_gd["dispconv_0"]["conv"]["kernel"] if "dispconv_0" in mp_gd \
        else jax.tree.leaves(mp_gd)[0]
    assert any(
        s.sharding.spec != P() for s in jax.tree.leaves(
            jax.tree.map(lambda a: a, ep_s))
        if hasattr(s, "sharding") and s.ndim >= 2 and s.shape[-1] % 2 == 0
    )
    del k
