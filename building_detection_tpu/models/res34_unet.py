"""Res34-UNet: ResNet-34-style encoder + UNet decoder with SE attention.

TPU-native rebuild of ``ResNetFamily().run_model('res34')``
(`/root/reference/predict_model/res34.py:27-170`):

* stem of three conv64-BN-ReLU, downsampling via strided 1x1 convs named
  ``pool1..4`` (`res34.py:54-66`), residual stages [3,4,6,3] at 64/128/256/512;
* ``low_to_high_feature`` cross-scale aggregation applied twice
  (`res34.py:71-75,151-159`);
* SE channel attention on all five pyramid levels (`res34.py:90-105`);
* four ``upsame_feature`` decoder stages (ConvT x2 + skip concat + 1x1 conv +
  residual block, `res34.py:143-149`);
* head: 3x3 conv64 ReLU -> 3x3 conv2 softmax (`res34.py:86-87`).

Reference trainable-parameter count: 22,910,272 (`res34.py:164`), verified in
``tests/test_models.py``.

Maps (B, H, W, 3) -> (B, H, W, 2) softmax for any H, W divisible by 16.
"""
from __future__ import annotations

import jax

from building_detection_tpu.core.module import Scope
from building_detection_tpu.nn import layers as L
from building_detection_tpu.nn.attention import se_block

Array = jax.Array
F_SIZE = 64


def _bn_conv(s: Scope, x: Array, features: int, kernel: int, name: str, dilation: int = 1) -> Array:
    x = L.conv2d(
        s, x, features, kernel, dilation=dilation, kernel_init=L.he_normal, name=name
    )
    x = L.batch_norm(s, x, name=f"{name}_BN")
    return L.relu(x)


def _res_block(s: Scope, x: Array, features: int, name: str, dilation: int = 1) -> Array:
    y = _bn_conv(s, x, features, 3, name=f"{name}_1", dilation=dilation)
    y = _bn_conv(s, y, features, 3, name=f"{name}_2", dilation=dilation)
    return L.relu(x + y)


def _encoder(s: Scope, x: Array):
    f = F_SIZE
    c1 = _bn_conv(s, x, f, 3, "conv1_1")
    c1 = _bn_conv(s, c1, f, 3, "conv1_2")
    c1 = _bn_conv(s, c1, f, 3, "conv1_3")

    c1 = L.remat_tag(c1)

    c2 = L.conv2d(s, c1, f, 1, strides=2, name="pool1")
    for i in range(3):
        c2 = _res_block(s, c2, f, f"conv2_{i}")
    c2 = L.remat_tag(c2)

    c3 = L.conv2d(s, c2, f * 2, 1, strides=2, name="pool2")
    for i in range(4):
        c3 = _res_block(s, c3, f * 2, f"conv3_{i}")
    c3 = L.remat_tag(c3)

    c4 = L.conv2d(s, c3, f * 4, 1, strides=2, name="pool3")
    for i in range(6):
        c4 = _res_block(s, c4, f * 4, f"conv4_{i}")
    c4 = L.remat_tag(c4)

    c5 = L.conv2d(s, c4, f * 8, 1, strides=2, name="pool4")
    for i in range(3):
        c5 = _res_block(s, c5, f * 8, f"conv5_{i}")
    c5 = L.remat_tag(c5)
    return c1, c2, c3, c4, c5


def _low_to_high(s: Scope, low: Array, mid: Array, high: Array):
    """Inject maxpooled lower-level features upward (`res34.py:151-159`)."""
    import jax.numpy as jnp

    low_x2 = L.max_pool(low)  # pool 2, stride 2
    low_x4 = L.max_pool(low, pool_size=2, strides=4)
    mid_x2 = L.max_pool(mid)
    high_cat = jnp.concatenate([high, mid_x2, low_x4], axis=-1)
    high_out = L.conv2d(s, high_cat, high_cat.shape[-1], 1, activation="relu", kernel_init=L.he_normal)
    mid_cat = jnp.concatenate([mid, low_x2], axis=-1)
    mid_out = L.conv2d(s, mid_cat, mid_cat.shape[-1], 1, activation="relu", kernel_init=L.he_normal)
    return mid_out, high_out


def _upsample_feature(s: Scope, low: Array, high: Array, name: str) -> Array:
    """ConvT x2 + skip concat + 1x1 conv + residual block (`res34.py:143-149`)."""
    import jax.numpy as jnp

    up = L.conv2d_transpose(s, high, low.shape[-1], 2, strides=2, activation="relu")
    out = jnp.concatenate([low, up], axis=-1)
    out = L.conv2d(s, out, low.shape[-1], 1, activation="relu", kernel_init=L.he_normal)
    return _res_block(s, out, out.shape[-1], name=f"upsame_{name}")


def res34_unet(s: Scope, x: Array) -> Array:
    c1, c2, c3, c4, c5 = _encoder(s, x)

    c2, c3 = _low_to_high(s, c1, c2, c3)
    c3, c4 = _low_to_high(s, c2, c3, c4)
    c1 = se_block(s, c1)
    c2 = se_block(s, c2)
    c3 = se_block(s, c3)
    c4 = se_block(s, c4)
    c5 = se_block(s, c5)

    up4 = L.remat_tag(_upsample_feature(s, c4, c5, name="4"))
    up3 = L.remat_tag(_upsample_feature(s, c3, up4, name="3"))
    up2 = L.remat_tag(_upsample_feature(s, c2, up3, name="2"))
    up1 = L.remat_tag(_upsample_feature(s, c1, up2, name="1"))

    out = L.conv2d(s, up1, 64, 3, activation="relu", kernel_init=L.he_normal)
    out = L.conv2d(s, out, 2, 3, activation="softmax", kernel_init=L.he_normal)
    return out
