"""Keras-exact Adam as an optax GradientTransformation.

The reference compiles plain Keras ``adam`` (`/root/reference/train_model/
res34.py:663-666`: beta1 0.9, beta2 0.999, epsilon 1e-7).  ``optax.adam``
is NOT step-for-step identical to Keras' implementation: optax adds its
epsilon to ``sqrt(v_hat)`` (the bias-corrected second moment) while Keras
folds both bias corrections into the step size and adds the raw epsilon
to ``sqrt(v)``::

    optax:  p -= lr * m_hat / (sqrt(v_hat) + eps)
    keras:  lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
            p  -= lr_t * m / (sqrt(v) + eps)

Algebraically these differ by ``eps`` vs ``eps / sqrt(1 - b2^t)`` in the
denominator — ~3e-6 vs 1e-7 effective epsilon on the first step — which
is enough to make trajectories drift measurably from a Keras run.  This
module implements the Keras form exactly; the multi-step trajectory is
pinned against real tf_keras Adam by ``scripts/tf_train_parity_probe.py``.

Schedule convention matches optax: ``learning_rate`` may be a float or a
callable evaluated at the 0-based update count (the count BEFORE the
increment), which is how the warmup-cosine schedule is indexed and tested
(`train/schedule.py`).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class KerasAdamState(NamedTuple):
    count: jax.Array  # number of updates applied so far
    mu: Any           # first moment (m)
    nu: Any           # second moment (v)


def keras_adam(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> optax.GradientTransformation:
    """``tf_keras.optimizers.Adam`` (non-amsgrad), bit-faithful update rule."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p)
        return KerasAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(grads, state, params=None):
        del params
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )
        t = (state.count + 1).astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, grads
        )
        # Keras: lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t), raw eps on sqrt(v)
        lr_t = lr * jnp.sqrt(1.0 - jnp.float32(b2) ** t) / (
            1.0 - jnp.float32(b1) ** t
        )
        updates = jax.tree_util.tree_map(
            lambda m, v: (-lr_t * m / (jnp.sqrt(v) + eps)).astype(m.dtype),
            mu,
            nu,
        )
        return updates, KerasAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
