"""LR schedule: continuous exponential decay, lr = lrate * 0.1^(step/decay_steps)
with decay_steps = lrate_decay * 1000 (/root/reference/train_dmsr.py:68-72)."""

from __future__ import annotations

import optax


def exp_decay_schedule(lrate: float, lrate_decay_k: int) -> optax.Schedule:
    return optax.exponential_decay(
        init_value=lrate,
        transition_steps=lrate_decay_k * 1000,
        decay_rate=0.1,
        staircase=False,
    )
