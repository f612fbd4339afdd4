"""Train state pytree + optimizer construction.

Optimizer parity: torch.optim.Adam(lr, weight_decay) as configured at
main_final.py:737-747 — torch Adam's weight_decay is L2-into-gradient (not
decoupled AdamW), so the optax chain is add_decayed_weights BEFORE
scale_by_adam. Defaults b1=0.9, b2=0.999, eps=1e-8 match torch.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any  # BatchNorm running stats ({} for stat-free models)
    opt_state: Any

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def make_lr_schedule(
    lr: float,
    schedule: str = "constant",
    total_steps: int | None = None,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Step -> learning-rate callable; the single source for the optimizer
    AND the observability stream (the reference's LearningRateMonitor,
    configs/trainer/default.yaml:21-22, logs the live value — so do we).

    schedule: "constant" (reference parity — configs/training/default.yaml
    fixed lr) | "cosine" (decay to 0 over total_steps, optional linear
    warmup) — a beyond-parity option, off by default.
    """
    if schedule == "constant":
        return optax.constant_schedule(lr)
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine schedule requires total_steps")
        if warmup_steps:
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr, warmup_steps=warmup_steps, decay_steps=total_steps
            )
        return optax.cosine_decay_schedule(init_value=lr, decay_steps=total_steps)
    raise ValueError(f"Unknown lr schedule: {schedule!r}")


def build_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    schedule: str = "constant",
    total_steps: int | None = None,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """torch-Adam-equivalent chain with an optional LR schedule (see
    make_lr_schedule). Always a schedule *callable* — even for constant —
    so the opt_state pytree has one structure across schedules and a
    checkpoint written under one schedule restores under another."""
    sched = make_lr_schedule(lr, schedule, total_steps, warmup_steps)

    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))  # torch Adam L2 semantics
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(sched))  # handles the -1 sign
    return optax.chain(*parts)


def create_member_states(
    model, rngs, example_input, tx: optax.GradientTransformation
) -> TrainState:
    """Stacked TrainState for K ensemble members: every leaf gains a leading
    member axis (member k initialized from rngs[k]). Feeds the multi-member
    vmap training path (trainer.StepFunctions.build(n_members=K)); unstack a
    trained member with member_state() to get a standard checkpointable
    TrainState."""
    import jax.numpy as jnp

    states = [create_train_state(model, r, example_input, tx) for r in rngs]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def member_state(states: TrainState, k: int) -> TrainState:
    """Member k of a stacked TrainState (inverse of create_member_states)."""
    return jax.tree_util.tree_map(lambda x: x[k], states)


def create_train_state(model, rng, example_input, tx: optax.GradientTransformation) -> TrainState:
    variables = model.init(rng, example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
