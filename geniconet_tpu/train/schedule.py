"""Cyclic triangular learning-rate schedule as a pure function of step.

Behavioral contract of torch ``CyclicLR(base_lr, max_lr,
cycle_momentum=False)`` with default step sizes, stepped *every batch*
(reference run.py:446-452, 253-254). Being a pure function of the global
step counter makes it jit-safe and trivially resumable — restoring the step
restores the schedule, unlike torch scheduler state.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cyclic_triangular"]


def cyclic_triangular(
    step, base_lr: float, max_lr: float, step_size_up: int = 2000, step_size_down: int = 2000
):
    """lr(step): rises base→max over `step_size_up` steps, falls back over
    `step_size_down`, repeating. step 0 => base_lr (torch semantics)."""
    period = step_size_up + step_size_down
    pos = jnp.asarray(step, jnp.float32) % period
    up = pos / step_size_up
    down = 1.0 - (pos - step_size_up) / step_size_down
    frac = jnp.where(pos <= step_size_up, up, down)
    return base_lr + (max_lr - base_lr) * frac
