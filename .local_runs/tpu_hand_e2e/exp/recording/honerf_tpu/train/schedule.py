"""Learning-rate schedule: linear warmup then cosine decay to
`alpha * base_lr` (reference `update_learning_rate`,
exp_runner.py:266-274)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_factor(
    step: jnp.ndarray, warm_up_end: float, end_iter: int, alpha: float
) -> jnp.ndarray:
    """Multiplicative LR factor at `step` (jit-friendly)."""
    step = jnp.asarray(step, dtype=jnp.float32)
    warm = step / jnp.maximum(warm_up_end, 1.0)
    progress = (step - warm_up_end) / jnp.maximum(end_iter - warm_up_end, 1.0)
    cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1.0 - alpha) + alpha
    return jnp.where((warm_up_end > 0) & (step < warm_up_end), warm, cos)


def make_lr_schedule(learning_rate: float, warm_up_end: float, end_iter: int, alpha: float):
    """optax-compatible schedule closure."""

    def schedule(step):
        return learning_rate * warmup_cosine_factor(step, warm_up_end, end_iter, alpha)

    return schedule
