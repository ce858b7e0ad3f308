"""Learning-rate schedules.

* :func:`warmup_cosine` — per-step linear warmup then half-cosine decay,
  exactly `/root/reference/train_model/res34.py:512-531`
  (``cosine_decay_with_warmup``).  The reference drives it from a per-batch
  Keras callback (`res34.py:534-568`); here it is a pure function of the step
  handed to optax, which also makes resume exact (the reference's
  ``global_step_init`` is never wired up, `res34.py:538`).
* :func:`exponential_decay` — per-epoch ``lr * 0.9**epoch``
  (`res34.py:456-462`), the unused alternative kept for completeness.
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(
    learning_rate_base: float,
    total_steps: int,
    warmup_learning_rate: float = 0.0,
    warmup_steps: int = 0,
    min_learn_rate: float = 0.0,
):
    """Returns ``schedule(step) -> lr`` matching `res34.py:512-531`."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cosine = 0.5 * learning_rate_base * (
            1
            + jnp.cos(
                jnp.pi
                * (step - warmup_steps)
                / float(max(total_steps - warmup_steps, 1))
            )
        )
        if warmup_steps > 0:
            k = (learning_rate_base - warmup_learning_rate) / warmup_steps
            linear = k * step + warmup_learning_rate
        else:
            linear = jnp.full_like(step, learning_rate_base)
        lr = jnp.where(step >= warmup_steps, cosine, linear)
        return jnp.maximum(lr, min_learn_rate)

    return schedule


def exponential_decay(lr_base: float = 1e-3, decay: float = 0.9, min_lr: float = 0.0):
    """Per-epoch decay (`res34.py:456-462`); pass the epoch index."""

    def schedule(epoch):
        return jnp.maximum(lr_base * jnp.power(decay, epoch), min_lr)

    return schedule
