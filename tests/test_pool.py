"""max_pool_3x3_s2_fast: packed-argmax pool vs lax reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssde_tpu.models.resnet import max_pool_3x3_s2
from ssde_tpu.ops.pool import max_pool_3x3_s2_fast


def _rand(shape, seed=0, dtype=jnp.bfloat16):
    # non-negative (the fast pool's precondition) and tie-free in bf16
    # almost surely, so gradient routing is uniquely determined
    x = jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32,
                           1e-3, 1.0)
    return x.astype(dtype)


@pytest.mark.parametrize("shape", [(2, 16, 32, 8), (1, 96, 320, 3),
                                   (3, 8, 128, 5)])
def test_forward_matches_reduce_window(shape):
    x = _rand(shape)
    ref = max_pool_3x3_s2(x)
    fast = max_pool_3x3_s2_fast(x)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(fast, np.float32))


@pytest.mark.parametrize("shape", [(2, 8, 16, 8), (1, 4, 32, 3)])
def test_backward_matches_select_and_scatter(shape):
    # tie-FREE inputs: a permutation of 1 + i/128 (exact in bf16's 7
    # mantissa bits, unique per image) makes the gradient routing
    # uniquely determined, so the fast pool must match
    # select_and_scatter exactly
    B, H, W, C = shape
    assert H * W <= 128
    vals = 1.0 + np.arange(H * W, dtype=np.float32) / 128.0
    rng = np.random.default_rng(3)
    x = np.stack(
        [rng.permutation(vals).reshape(H, W) for _ in range(B * C)]
    ).reshape(B, C, H, W).transpose(0, 2, 3, 1)
    x = jnp.asarray(x, jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(2), max_pool_3x3_s2(x).shape,
                          jnp.float32)

    def loss(f, x):
        return jnp.sum(f(x).astype(jnp.float32) * g)

    dref = jax.grad(lambda x: loss(max_pool_3x3_s2, x))(x)
    dfast = jax.grad(lambda x: loss(max_pool_3x3_s2_fast, x))(x)
    # bf16-ULP tolerance: when two windows route into one pixel the
    # reference accumulates in bf16 while the fast path sums in f32
    np.testing.assert_allclose(np.asarray(dref, np.float32),
                               np.asarray(dfast, np.float32),
                               rtol=2**-6, atol=2**-6)


def test_backward_valid_under_ties():
    # with bf16 ties the tied element CHOICE may differ from torch, but
    # each window must still route its full cotangent to exactly one of
    # its maximal elements: fwd values exact, total mass preserved
    x = _rand((2, 16, 32, 4), seed=1)
    out = max_pool_3x3_s2(x)
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), out.shape,
                                  jnp.float32)) + 0.1
    d = jax.grad(
        lambda x: jnp.sum(max_pool_3x3_s2_fast(x).astype(jnp.float32) * g)
    )(x)
    np.testing.assert_allclose(float(jnp.sum(d.astype(jnp.float32))),
                               float(jnp.sum(g)), rtol=1e-3)


def test_zeros_route_single_gradient():
    # all-zero windows are fully tied: exactly ONE element per window must
    # receive the cotangent (valid subgradient; total mass preserved)
    x = jnp.zeros((1, 8, 128, 2), jnp.bfloat16)
    g = jnp.ones(max_pool_3x3_s2(x).shape, jnp.float32)
    d = jax.grad(
        lambda x: jnp.sum(max_pool_3x3_s2_fast(x).astype(jnp.float32) * g)
    )(x)
    total = float(jnp.sum(d.astype(jnp.float32)))
    assert total == float(np.prod(g.shape))
