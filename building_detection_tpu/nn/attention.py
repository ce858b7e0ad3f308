"""Attention blocks shared by the model zoo, as pure NHWC functions.

TPU-first re-expressions of the reference's Keras blocks — identical math,
cleaner shapes (the reference's ``RepeatVector``/``Cropping2D`` tricks become
plain broadcasts / a branch-axis softmax):

* :func:`se_block`        — `/root/reference/predict_model/res34.py:90-105`
* :func:`sse_block` / :func:`cse_block` / :func:`scse_block`
                          — `/root/reference/predict_model/scse.py:20-46`
* :func:`bam_attention`   — `/root/reference/predict_model/bam.py:20-71`
* :func:`sknet_block`     — `/root/reference/predict_model/v3plus.py:74-138`
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from building_detection_tpu.core.module import Scope
from building_detection_tpu.nn import layers as L

Array = jax.Array


def se_block(s: Scope, x: Array) -> Array:
    """Squeeze-excite channel attention (``attention_demo`` in the reference).

    GAP -> Dense(C/2) -> BN -> ReLU -> Dense(C) -> BN -> sigmoid -> scale.
    """
    ch = x.shape[-1]
    gap = L.global_avg_pool(x)  # (B, C)
    f = L.dense(s, gap, ch // 2)
    f = L.batch_norm(s, f)
    f = L.relu(f)
    f = L.dense(s, f, ch)
    f = L.batch_norm(s, f)
    f = L.sigmoid(f)
    return x * f[:, None, None, :]


def sse_block(s: Scope, x: Array) -> Array:
    """Spatial squeeze-excite: 1x1 conv -> sigmoid gate."""
    gate = L.conv2d(s, x, 1, 1, activation="sigmoid")
    return gate * x


def cse_block(s: Scope, x: Array, rate: int = 16) -> Array:
    """Channel squeeze-excite: GAP -> 1x1 conv C/16 -> 1x1 conv C -> sigmoid.

    Note the reference hard-codes ``// 16`` regardless of ``rate``
    (`/root/reference/predict_model/scse.py:34`); we keep that behaviour.
    """
    del rate
    ch = x.shape[-1]
    g = L.global_avg_pool(x, keepdims=True)  # (B,1,1,C)
    g = L.conv2d(s, g, ch // 16, 1)
    g = L.conv2d(s, g, ch, 1)
    g = L.sigmoid(g)
    return g * x


def scse_block(s: Scope, x: Array) -> Array:
    return sse_block(s, x) + cse_block(s, x)


def bam_channel_gate(s: Scope, x: Array, rate: int = 16) -> Array:
    """BAM channel branch: GAP -> Dense(C/16) -> Dense(C/16) -> Dense(C)."""
    ch = x.shape[-1]
    f = L.global_avg_pool(x)
    f = L.dense(s, f, ch // rate)
    f = L.batch_norm(s, f)
    f = L.relu(f)
    f = L.dense(s, f, ch // rate)
    f = L.batch_norm(s, f)
    f = L.relu(f)
    f = L.dense(s, f, ch)
    return f  # (B, C), no activation


def bam_spatial_gate(s: Scope, x: Array, rate: int = 16, d: int = 4) -> Array:
    """BAM spatial branch: 1x1 C/16 -> two 3x3 dilated(d=4) -> 1x1 -> 1ch."""
    ch = x.shape[-1]
    f = L.conv2d(s, x, ch // rate, 1)
    f = L.batch_norm(s, f)
    f = L.relu(f)
    f = L.conv2d(s, f, ch // rate, 3, dilation=d)
    f = L.batch_norm(s, f)
    f = L.relu(f)
    f = L.conv2d(s, f, ch // rate, 3, dilation=d)
    f = L.batch_norm(s, f)
    f = L.relu(f)
    f = L.conv2d(s, f, 1, 1)
    return f  # (B, H, W, 1), no activation


def bam_attention(s: Scope, x: Array) -> Array:
    """Bottleneck Attention Module: ``x * sigmoid(c + s) + x``.

    The reference broadcasts the channel gate with ``RepeatVector`` + reshape
    (`/root/reference/predict_model/bam.py:62-64`); a plain NHWC broadcast is
    identical.
    """
    c = bam_channel_gate(s, x)[:, None, None, :]  # (B,1,1,C)
    sp = bam_spatial_gate(s, x)  # (B,H,W,1)
    gate = L.sigmoid(c + sp)
    return x * gate + x


def sknet_block(s: Scope, x: Array, reduce: int = 16) -> Array:
    """Selective-kernel block over 5 branches (d=1, d=6, d=12, d=18, GAP).

    The reference computes the per-branch weights by concatenating five
    (1,1,C) heads on axis=-2, softmaxing over that axis and slicing them back
    out with ``Cropping2D`` (`/root/reference/predict_model/v3plus.py:114-132`).
    Here the heads are stacked on a new branch axis and softmaxed across it —
    the same math with the shapes stated directly.
    """
    conv = L.conv2d(s, x, 256, 3)
    conv = L.batch_norm(s, conv)
    conv = L.relu(conv)

    def branch(d: int) -> Array:
        k = 1 if d == 1 else 3
        dil = 1 if d == 1 else d
        b = L.conv2d(s, conv, 256, k, dilation=dil)
        b = L.batch_norm(s, b)
        return L.relu(b)

    d1, d6, d12, d18 = branch(1), branch(6), branch(12), branch(18)

    gap = L.global_avg_pool(conv, keepdims=True)  # (B,1,1,256)
    gap = L.conv2d(s, gap, 256, 1)
    gap = L.batch_norm(s, gap)
    gap = L.relu(gap)
    gap = jnp.broadcast_to(gap, conv.shape)  # UpSampling2D(H) of a (1,1) map

    total = d1 + d6 + d12 + d18 + gap
    z = L.global_avg_pool(total, keepdims=True)  # (B,1,1,256)
    ch = z.shape[-1]
    z = L.conv2d(s, z, ch // reduce, 1)
    z = L.batch_norm(s, z)
    z = L.relu(z)

    heads = [L.conv2d(s, z, ch, 1) for _ in range(5)]  # 5 x (B,1,1,C)
    logits = jnp.stack(heads, axis=1)  # (B,5,1,1,C)
    weights = jax.nn.softmax(logits, axis=1)

    branches = jnp.stack([d1, d6, d12, d18, gap], axis=1)  # (B,5,H,W,C)
    fused = jnp.sum(branches * weights, axis=1)
    fused = L.batch_norm(s, fused)
    return L.relu(fused)
