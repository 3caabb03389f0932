"""fused (raveled) Adam == optax.adam, step for step.

The train step's optimizer math runs over ONE raveled vector (~2,600
launch-bound per-leaf kernels -> a handful of fused ops, ~26 ms -> ~4 ms
of the B=48 step); these tests pin its numerics to optax.adam exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssde_tpu.train.state import TrainState, create_optimizer, fused_adam


def tree_like(seed, scale=1.0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    return {
        "a": {"kernel": jax.random.normal(k[0], (3, 3, 4, 8)) * scale,
              "bias": jax.random.normal(k[1], (8,)) * scale},
        "b": {"w": jax.random.normal(k[2], (16, 2)) * scale},
        "h0": jax.random.normal(k[3], (2, 4)) * scale,
    }


def test_fused_adam_matches_optax():
    sched = optax.constant_schedule(1e-3)
    params = tree_like(0)
    ours = fused_adam(sched)
    ref = optax.adam(sched)
    s1, s2 = ours.init(params), ref.init(params)
    p1 = p2 = params
    for i in range(5):
        grads = tree_like(10 + i, scale=0.1)
        u1, s1 = ours.update(grads, s1, p1)
        u2, s2 = ref.update(grads, s2, p2)
        p1 = optax.apply_updates(p1, u1)
        p2 = optax.apply_updates(p2, u2)
    for l1, l2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-7)


def test_fused_adam_with_schedule_decay():
    sched = optax.exponential_decay(1e-3, transition_steps=2,
                                    decay_rate=0.1, staircase=True)
    params = tree_like(1)
    ours, ref = fused_adam(sched), optax.adam(sched)
    s1, s2 = ours.init(params), ref.init(params)
    p1 = p2 = params
    for i in range(4):  # crosses the decay boundary
        grads = tree_like(20 + i, scale=0.1)
        u1, s1 = ours.update(grads, s1, p1)
        u2, s2 = ref.update(grads, s2, p2)
        p1 = optax.apply_updates(p1, u1)
        p2 = optax.apply_updates(p2, u2)
    for l1, l2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-7)


def test_h0_freeze_swap_keeps_moments():
    """Swapping in the freeze head mid-training preserves Adam moments
    (same state structure) and h0 stops moving."""
    params = tree_like(2)
    state = TrainState.create(params, {}, create_optimizer(1e-3, 0, 1))
    grads = tree_like(30, scale=0.1)
    state = state.replace(tx=state.tx)  # no-op sanity
    state = state.apply_gradients(grads)
    h0_before = np.asarray(state.params["h0"])

    frozen_tx = create_optimizer(1e-3, 0, 1, freeze_h0=True)
    state = state.replace(tx=frozen_tx)
    state = state.apply_gradients(tree_like(31, scale=0.1))
    np.testing.assert_array_equal(np.asarray(state.params["h0"]), h0_before)
    # non-h0 leaves still move
    assert not np.allclose(np.asarray(state.params["b"]["w"]),
                           np.asarray(params["b"]["w"]))
