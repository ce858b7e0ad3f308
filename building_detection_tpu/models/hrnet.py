"""HRNet: multi-resolution network with cross-resolution fusion.

TPU-native rebuild of ``HRNet()`` (`/root/reference/predict_model/hrnet.py:20-203`):
stem conv64 s2 -> layer1 (1 bottleneck + 3 identity blocks @256ch) -> three
transition layers spawning parallel branches at 32/64/128/256 channels and
strides 2/4/8/16 -> per-branch 4 basic blocks -> fuse blocks exchanging
information across resolutions (each fuse stage runs once, as in the
reference, `hrnet.py:186,196`) -> x2 upsample -> conv64 -> 1x1 softmax.

Maps (B, H, W, 3) -> (B, H, W, num_classes) for any H, W divisible by 16.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from building_detection_tpu.core.module import Scope
from building_detection_tpu.nn import layers as L

Array = jax.Array


def _cbr(s: Scope, x: Array, filters: int, kernel: int = 3, strides: int = 1, activate: bool = True) -> Array:
    x = L.conv2d(s, x, filters, kernel, strides=strides)
    x = L.batch_norm(s, x)
    return L.relu(x) if activate else x


def _conv_block(s: Scope, x: Array, filters: int, strides: int = 1) -> Array:
    y = _cbr(s, x, filters // 4, 1, strides)
    y = _cbr(s, y, filters // 4, 3)
    y = _cbr(s, y, filters, 1, activate=False)
    short = _cbr(s, x, filters, 1, strides, activate=False)
    return L.relu(y + short)


def _identity_block(s: Scope, x: Array, filters: int) -> Array:
    y = _cbr(s, x, filters // 4, 1)
    y = _cbr(s, y, filters // 4, 3)
    y = _cbr(s, y, filters, 1, activate=False)
    return L.relu(y + x)


def _basic_block(s: Scope, x: Array, filters: int) -> Array:
    y = _cbr(s, x, filters, 3)
    y = _cbr(s, y, filters, 3, activate=False)
    return L.relu(y + x)


def _branch(s: Scope, x: Array, channels: int) -> Array:
    for _ in range(4):
        x = _basic_block(s, x, channels)
    return x


def _fuse_block_1(s: Scope, x: List[Array]) -> List[Array]:
    """Two-branch fusion (`hrnet.py:99-111`)."""
    up = _cbr(s, x[1], 32, 1, activate=False)
    up = L.upsample2d(up, 2)
    x0 = x[0] + up

    down = _cbr(s, x[0], 64, 3, strides=2, activate=False)
    x1 = down + x[1]
    return [x0, x1]


def _fuse_block_2(s: Scope, x: List[Array]) -> List[Array]:
    """Three-branch fusion (`hrnet.py:114-139`)."""
    x12 = L.upsample2d(_cbr(s, x[1], 32, 1, activate=False), 2)
    x13 = L.upsample2d(_cbr(s, x[2], 32, 1, activate=False), 4)
    x0 = x[0] + x12 + x13

    x21 = _cbr(s, x[0], 64, 3, 2, activate=False)
    x23 = L.upsample2d(_cbr(s, x[2], 64, 1, activate=False), 2)
    x1 = x21 + x[1] + x23

    x31 = _cbr(s, x[0], 32, 3, 2)
    x31 = _cbr(s, x31, 128, 3, 2, activate=False)
    x32 = _cbr(s, x[1], 128, 3, 2, activate=False)
    x2 = x31 + x32 + x[2]
    return [x0, x1, x2]


def _fuse_block_3(s: Scope, x: List[Array]) -> Array:
    """Final concat-style fusion to the highest resolution (`hrnet.py:142-162`)."""
    x0 = x[0]
    x1 = L.upsample2d(_cbr(s, x[1], 32, 1, activate=False), 2)
    x2 = L.upsample2d(_cbr(s, x[2], 32, 1, activate=False), 4)
    x3 = L.upsample2d(_cbr(s, x[3], 32, 1, activate=False), 8)
    return jnp.concatenate([x0, x1, x2, x3], axis=-1)


def hrnet(s: Scope, x: Array, num_classes: int = 2) -> Array:
    y = _cbr(s, x, 64, strides=2)

    # layer1: bottleneck + 3 identity blocks at 256 channels
    y = _conv_block(s, y, 256)
    for _ in range(3):
        y = _identity_block(s, y, 256)
    y = L.remat_tag(y)

    # transition 1 -> branches at x2 (32ch) and x4 (64ch)
    t0 = _cbr(s, y, 32)
    t1 = _cbr(s, y, 64, strides=2)
    b0 = _branch(s, t0, 32)
    b1 = _branch(s, t1, 64)
    f = [L.remat_tag(v) for v in _fuse_block_1(s, [b0, b1])]

    # transition 2 -> add x8 (128ch)
    t0 = _cbr(s, f[0], 32)
    t1 = _cbr(s, f[1], 64)
    t2 = _cbr(s, f[1], 128, strides=2)
    b0 = _branch(s, t0, 32)
    b1 = _branch(s, t1, 64)
    b2 = _branch(s, t2, 128)
    f = [L.remat_tag(v) for v in _fuse_block_2(s, [b0, b1, b2])]

    # transition 3 -> add x16 (256ch)
    t0 = _cbr(s, f[0], 32)
    t1 = _cbr(s, f[1], 64)
    t2 = _cbr(s, f[2], 128)
    t3 = _cbr(s, f[2], 256, strides=2)
    b0 = _branch(s, t0, 32)
    b1 = _branch(s, t1, 64)
    b2 = _branch(s, t2, 128)
    b3 = _branch(s, t3, 256)
    out = L.remat_tag(_fuse_block_3(s, [b0, b1, b2, b3]))

    out = L.upsample2d(out, 2)
    out = _cbr(s, out, 64)
    return L.conv2d(s, out, num_classes, 1, activation="softmax")
