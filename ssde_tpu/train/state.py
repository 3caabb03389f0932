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

from typing import Any, Optional

import flax
import jax
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


def create_optimizer(
    learning_rate: float = 1e-4,
    scheduler_step_size: int = 15,
    steps_per_epoch: int = 1,
    freeze_h0: bool = False,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(learning_rate, scheduler_step_size, steps_per_epoch)
    # always chain a leading slot (identity or h0-freeze) so swapping the
    # freeze in mid-training keeps the optimizer state structure unchanged
    # (both have EmptyState) and Adam moments survive the swap
    head = _zero_h0_grads() if freeze_h0 else optax.identity()
    return optax.chain(head, optax.adam(schedule))


def _is_h0_path(path) -> bool:
    return any(getattr(k, "key", None) in ("h0", "c0") for k in path)


def _zero_h0_grads() -> optax.GradientTransformation:
    """Zero gradients of learned initial hidden states (h0/c0 leaves)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        import jax.numpy as jnp

        flat = flax.traverse_util.flatten_dict(updates, sep="/")
        flat = {
            k: (jnp.zeros_like(v) if k.split("/")[-1] in ("h0", "c0") else v)
            for k, v in flat.items()
        }
        return flax.traverse_util.unflatten_dict(flat, sep="/"), state

    return optax.GradientTransformation(init_fn, update_fn)
