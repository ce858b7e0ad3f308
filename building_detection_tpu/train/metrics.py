"""Segmentation metrics from argmax confusion counts.

Exact rebuild of `/root/reference/train_model/res34.py:359-452`: PA, IoU,
MIoU and F1 over the binary argmax masks, each with K.epsilon() smoothing in
the denominators.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

EPSILON = 1e-7


def _confusion(y_true: jax.Array, y_pred: jax.Array):
    yt = jnp.argmax(y_true[..., :2], axis=-1).astype(jnp.int32)
    yp = jnp.argmax(y_pred, axis=-1).astype(jnp.int32)
    tp = jnp.sum(yt * yp).astype(jnp.float32)
    tn = jnp.sum((1 - yt) * (1 - yp)).astype(jnp.float32)
    fp = jnp.sum((1 - yt) * yp).astype(jnp.float32)
    fn = jnp.sum(yt * (1 - yp)).astype(jnp.float32)
    return tp, tn, fp, fn


def pixel_accuracy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    return (tp + tn) / (tp + tn + fp + fn + EPSILON)


def iou(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    return tp / (tp + fp + fn + EPSILON)


def miou(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    iou0 = tp / (tp + fp + fn + EPSILON)
    iou1 = tn / (tn + fp + fn + EPSILON)
    return (iou0 + iou1) / 2


def f1_score(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    recall = tp / (tp + fn + EPSILON)
    precision = tp / (tp + fp + EPSILON)
    return (2.0 * precision * recall) / (precision + recall + EPSILON)


def all_metrics(y_true: jax.Array, y_pred: jax.Array) -> Dict[str, jax.Array]:
    """All four, sharing one confusion computation (`res34.py:666`)."""
    tp, tn, fp, fn = _confusion(y_true, y_pred)
    iou0 = tp / (tp + fp + fn + EPSILON)
    iou1 = tn / (tn + fp + fn + EPSILON)
    recall = tp / (tp + fn + EPSILON)
    precision = tp / (tp + fp + EPSILON)
    return {
        "PA": (tp + tn) / (tp + tn + fp + fn + EPSILON),
        "IoU": iou0,
        "MIoU": (iou0 + iou1) / 2,
        "F1_score": (2.0 * precision * recall) / (precision + recall + EPSILON),
    }
