"""SCSE-UNet: classic UNet with concurrent spatial+channel squeeze-excite.

TPU-native rebuild of ``UNet(2)`` (`/root/reference/predict_model/scse.py:49-97`):
encoder 64->128->256->512->1024 (double 3x3 conv + maxpool, no BN),
Conv2DTranspose decoder with an scSE block after every decoder stage
(`scse.py:75,81,87,93`), 1x1 softmax head.

Maps (B, H, W, 3) -> (B, H, W, num_classes) for any H, W divisible by 16.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from building_detection_tpu.core.module import Scope
from building_detection_tpu.nn import layers as L
from building_detection_tpu.nn.attention import scse_block

Array = jax.Array


def scse_unet(s: Scope, x: Array, num_classes: int = 2) -> Array:
    def double_conv(y: Array, ch: int) -> Array:
        y = L.conv2d(s, y, ch, 3, activation="relu")
        y = L.conv2d(s, y, ch, 3, activation="relu")
        return y

    c1 = L.remat_tag(double_conv(x, 64))
    c2 = L.remat_tag(double_conv(L.max_pool(c1), 128))
    c3 = L.remat_tag(double_conv(L.max_pool(c2), 256))
    c4 = L.remat_tag(double_conv(L.max_pool(c3), 512))
    c5 = L.remat_tag(double_conv(L.max_pool(c4), 1024))

    def up_stage(y: Array, skip: Array, ch: int) -> Array:
        up = L.conv2d_transpose(s, y, ch, 3, strides=2, activation="relu")
        y = jnp.concatenate([up, skip], axis=-1)
        y = double_conv(y, ch)
        return scse_block(s, y)

    d1 = L.remat_tag(up_stage(c5, c4, 512))
    d2 = L.remat_tag(up_stage(d1, c3, 256))
    d3 = L.remat_tag(up_stage(d2, c2, 128))
    d4 = L.remat_tag(up_stage(d3, c1, 64))

    return L.conv2d(s, d4, num_classes, 1, activation="softmax")
