"""Train state and optimizer.

Adam(lr=1e-4) + StepLR(step=15 epochs, gamma=0.1) matching reference
trainer.py:127-129 / options.py:170-181, expressed as an optax schedule
keyed on the global step (steps_per_epoch supplied by the trainer).

``h0_mask_fn`` reproduces the reference's "freeze learned hidden state
after --h_s_epoch" behaviour (trainer_gru.py:295-307) with an
optax.masked zero-out applied from the trainer once the epoch threshold is
crossed (see trainer_gru.Trainer).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )

    @classmethod
    def create(cls, params, batch_stats, tx):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def make_lr_schedule(learning_rate: float, scheduler_step_size: int,
                     steps_per_epoch: int, gamma: float = 0.1):
    """StepLR: lr * gamma^(epoch // step_size) as an optax schedule.

    Decays at EVERY multiple of step_size epochs (15, 30, 45, ...), matching
    torch.optim.lr_scheduler.StepLR (reference trainer.py:128-129), not just
    the first boundary. ``scheduler_step_size <= 0`` disables decay (constant
    LR — the reference GRU trainer's effective behavior, trainer_gru.py:316).
    """
    if scheduler_step_size <= 0:
        return optax.constant_schedule(learning_rate)
    boundary = scheduler_step_size * max(1, steps_per_epoch)
    return optax.exponential_decay(
        learning_rate, transition_steps=boundary, decay_rate=gamma,
        staircase=True,
    )


class FusedAdamState(NamedTuple):
    count: jax.Array
    mu: jax.Array      # first moment, one raveled f32 vector
    nu: jax.Array      # second moment, likewise


def fused_adam(schedule, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8,
               freeze_keys: tuple = ()) -> optax.GradientTransformation:
    """Adam over ONE raveled parameter vector (optax.adam semantics).

    Cuts the per-leaf optimizer kernels (~900 tiny ops at ~250 leaves)
    to a handful of fused vector ops. MEASURED NEUTRAL on the v5e B=48
    step (268 vs 273 samples/s): the f32[64]-shaped op time that
    motivated it is full-tensor BN/wgrad REDUCES (big reads, tiny
    outputs), not optimizer dispatch — see PLAN.md round 4. Kept as an
    opt-in (SSDE_FUSED_ADAM=1) with exact optax.adam numerics
    (tests/test_optimizer.py); NOTE the axon TPU runtime rejects
    donation+raveled-param programs, so enabling it also disables step
    donation (see jit_step).
    """
    from jax.flatten_util import ravel_pytree

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        z = jnp.zeros(flat.shape, jnp.float32)
        return FusedAdamState(jnp.zeros((), jnp.int32), z, z)

    def update_fn(updates, state, params=None):
        flat, unravel = ravel_pytree(updates)
        flat = flat.astype(jnp.float32)
        count = state.count + 1
        mu = state.mu * b1 + (1.0 - b1) * flat
        nu = state.nu * b2 + (1.0 - b2) * jnp.square(flat)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        lr = schedule(state.count)
        step = (-lr) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        out = unravel(step)
        if freeze_keys:
            # exact freeze (torch requires_grad=False semantics): zero the
            # UPDATE, not just the gradient — a zeroed gradient alone lets
            # the decaying first moment keep nudging the parameter
            flat = flax.traverse_util.flatten_dict(out, sep="/")
            flat = {
                k: (jnp.zeros_like(v)
                    if k.split("/")[-1] in freeze_keys else v)
                for k, v in flat.items()
            }
            out = flax.traverse_util.unflatten_dict(flat, sep="/")
        return out, FusedAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _fused_adam_enabled() -> bool:
    import os

    return os.environ.get("SSDE_FUSED_ADAM") == "1"


def jit_step(step):
    """jit a train step, donating state unless the fused raveled Adam is
    on (the axon TPU runtime rejects donation-aliasing of parameters that
    are slices of one raveled vector — INVALID_ARGUMENT at run time)."""
    if _fused_adam_enabled():
        return jax.jit(step)
    return jax.jit(step, donate_argnums=(0,))


def create_optimizer(
    learning_rate: float = 1e-4,
    scheduler_step_size: int = 15,
    steps_per_epoch: int = 1,
    freeze_h0: bool = False,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(learning_rate, scheduler_step_size, steps_per_epoch)
    # always chain the same slots (identity or h0-freeze) so swapping the
    # freeze in mid-training keeps the optimizer state structure unchanged
    # (all masks have EmptyState) and Adam moments survive the swap.
    # The freeze zeroes BOTH the gradient (head — moments stop
    # accumulating) and the update (tail — the parameter is exactly
    # frozen; zeroing grads alone lets the decaying first moment keep
    # nudging it, unlike the reference's requires_grad=False).
    head = _zero_h0(("h0", "c0")) if freeze_h0 else optax.identity()
    if _fused_adam_enabled():
        return optax.chain(
            head, fused_adam(schedule,
                             freeze_keys=("h0", "c0") if freeze_h0 else ()))
    tail = _zero_h0(("h0", "c0")) if freeze_h0 else optax.identity()
    return optax.chain(head, optax.adam(schedule), tail)


def _zero_h0(keys=("h0", "c0")) -> optax.GradientTransformation:
    """Zero pass-through leaves named in ``keys`` (gradients when chained
    before Adam, updates when chained after)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        flat = flax.traverse_util.flatten_dict(updates, sep="/")
        flat = {
            k: (jnp.zeros_like(v) if k.split("/")[-1] in keys else v)
            for k, v in flat.items()
        }
        return flax.traverse_util.unflatten_dict(flat, sep="/"), state

    return optax.GradientTransformation(init_fn, update_fn)
