"""Losses with exact TF-reference semantics.

The reference compiles ``edge_focal_loss`` (`/root/reference/train_model/
res34.py:663-666`); ``binary_crossentropy`` and ``focal_loss`` are available
alternatives (`res34.py:319-341`).  All operate on softmax *probabilities*
(the models end in softmax) and take ``y_true`` of shape (N, H, W, 2) or
(N, H, W, 4) where channels 2:4 are the (f_edge, p_edge) weight bands
(`res34.py:104`).

``K.epsilon()`` is 1e-7.  The math is kept literally (log of probabilities
plus epsilon) for parity with the reference — all five models end in softmax
(`predict_model/*.py`), so losses consume probabilities, never logits.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # K.epsilon()


def binary_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """`res34.py:319-328`."""
    y = y_true[..., :2]
    loss = y * jnp.log(y_pred + EPSILON)
    return -jnp.mean(jnp.sum(loss, axis=-1))


def focal_loss(
    y_true: jax.Array, y_pred: jax.Array, alpha: Tuple[float, float] = (0.5, 0.5)
) -> jax.Array:
    """`res34.py:331-341` (gamma=2 via the squared (1-p) factor)."""
    y = y_true[..., :2]
    w = jnp.asarray(alpha, y_pred.dtype)
    loss = w * y * (1 - y_pred) * (1 - y_pred) * jnp.log(y_pred + EPSILON)
    return -jnp.mean(jnp.sum(loss, axis=-1))


def edge_focal_loss(
    y_true: jax.Array,
    y_pred: jax.Array,
    class_weights: Tuple[float, float] = (0.35, 0.65),
) -> jax.Array:
    """`res34.py:344-356`: class weights x edge-band weights x focal."""
    y = y_true[..., :2]
    edge_w = y_true[..., 2:4]
    w = jnp.asarray(class_weights, y_pred.dtype)
    loss = w * edge_w * y * (1 - y_pred) * (1 - y_pred) * jnp.log(y_pred + EPSILON)
    return -jnp.mean(jnp.sum(loss, axis=-1))


LOSSES = {
    "binary_crossentropy": binary_crossentropy,
    "focal_loss": focal_loss,
    "edge_focal_loss": edge_focal_loss,
}
