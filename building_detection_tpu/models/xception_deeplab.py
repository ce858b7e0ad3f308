"""Xception-65-style DeepLabv3+ models (plain and BAM variants).

TPU-native rebuild of ``Xception_DeepLabV3_Plus``
(`/root/reference/predict_model/v3plus.py:170-350`) and
``Xception_DeepLabV3_Plus_bam`` (`/root/reference/predict_model/bam.py:170-338`).

Backbone (output stride 16): entry 32(s2)/64 convs, three residual
separable-conv blocks at 128/256/728 with stride 2, a 16-block middle flow at
728 channels, exit flow 1024/1536/1536/2048 at stride 1.  The BAM variant
inserts BAM attention after the entry convs, after the 128 and 256 blocks and
after the middle flow (`bam.py:182,198,216,253`).

Head: ASPP (1x1 + 3x3 dilated d=6/12/18 + image pooling) in parallel with a
selective-kernel (SKNet) block, concatenated (`v3plus.py:295-313`).  The
reference's image pooling is ``AveragePooling2D(32)`` + ``UpSampling2D(32)``,
which on the fixed 512 input (32x32 feature map) is exactly global average
pooling + broadcast; we implement it that way so the models stay
shape-polymorphic (`v3plus.py:302-304`).

Decoders differ between the two variants and are kept faithful:
* plain: skips to c2 (x8), c1 (x4, ConvT), c (x2, ConvT), final x2 upsample
  (`v3plus.py:321-345`);
* BAM: skips to c2 and c1 only, final x4 upsample (`bam.py:320-333`).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from building_detection_tpu.core.module import Scope
from building_detection_tpu.nn import layers as L
from building_detection_tpu.nn.attention import bam_attention, scse_block, sknet_block

Array = jax.Array


def _cbr(
    s: Scope,
    x: Array,
    filters: int,
    kernel: int,
    strides: int = 1,
    activate: bool = True,
    dilation: int = 1,
) -> Array:
    x = L.conv2d(s, x, filters, kernel, strides=strides, dilation=dilation)
    x = L.batch_norm(s, x)
    return L.relu(x) if activate else x


def _sep_bn(s: Scope, x: Array, filters: int, strides: int = 1) -> Array:
    x = L.separable_conv2d(s, x, filters, 3, strides=strides)
    return L.batch_norm(s, x)


def _backbone(s: Scope, x: Array, use_bam: bool) -> List[Array]:
    """Returns [c, c1, c2, c3, c4, c5] feature pyramid."""
    x = _cbr(s, x, 32, 3, strides=2)
    x = _cbr(s, x, 64, 3)
    if use_bam:
        x = bam_attention(s, x)
    c = x  # x2

    # entry block 1 -> 128 channels, stride 2 (maxpool path)
    residual = _cbr(s, x, 128, 1, strides=2, activate=False)
    x = _sep_bn(s, x, 128)
    x = L.relu(x)
    x = _sep_bn(s, x, 128)
    x = L.max_pool(x, pool_size=3, strides=2, padding="SAME")
    x = x + residual
    c1 = x = L.remat_tag(x)  # x4
    if use_bam:
        x = bam_attention(s, x)

    # entry block 2 -> 256 channels, stride 2
    residual = _cbr(s, x, 256, 1, strides=2, activate=False)
    x = L.relu(x)
    x = _sep_bn(s, x, 256)
    x = L.relu(x)
    x = _sep_bn(s, x, 256)
    x = L.relu(x)
    x = _sep_bn(s, x, 256, strides=2)
    x = x + residual
    c2 = x = L.remat_tag(x)  # x8
    if use_bam:
        x = bam_attention(s, x)

    # entry block 3 -> 728 channels, stride 2
    residual = _cbr(s, x, 728, 1, strides=2, activate=False)
    x = L.relu(x)
    x = _sep_bn(s, x, 728)
    x = L.relu(x)
    x = _sep_bn(s, x, 728)
    x = L.relu(x)
    x = _sep_bn(s, x, 728, strides=2)
    x = x + residual
    c3 = x = L.remat_tag(x)  # x16

    # middle flow: 16 residual separable blocks at 728 channels
    for block in range(16):
        residual = x
        x = L.relu(x)
        x = _sep_bn(s, x, 728)
        x = L.relu(x)
        x = _sep_bn(s, x, 728)
        x = L.relu(x)
        x = _sep_bn(s, x, 728)
        x = x + residual
        if block % 4 == 3:
            x = L.remat_tag(x)
    c4 = x
    if use_bam:
        x = bam_attention(s, x)

    # exit flow (stride 1)
    residual = _cbr(s, x, 1024, 1, activate=False)
    x = L.relu(x)
    x = _sep_bn(s, x, 728)
    x = L.relu(x)
    x = _sep_bn(s, x, 1024)
    x = L.relu(x)
    x = _sep_bn(s, x, 1024)
    x = x + residual

    x = _sep_bn(s, x, 1536)
    x = L.relu(x)
    x = _sep_bn(s, x, 1536)
    x = L.relu(x)
    x = _sep_bn(s, x, 2048)
    x = L.relu(x)
    c5 = L.remat_tag(x)
    return [c, c1, c2, c3, c4, c5]


def _aspp(s: Scope, x: Array) -> Array:
    """Atrous spatial pyramid pooling (`v3plus.py:295-307`)."""
    conv = _cbr(s, x, 256, 1)
    p1 = _cbr(s, x, 256, 3, dilation=6)
    p2 = _cbr(s, x, 256, 3, dilation=12)
    p3 = _cbr(s, x, 256, 3, dilation=18)
    # Image pooling: global average + 1x1 conv + broadcast (== the
    # reference's AveragePooling2D(32)/UpSampling2D(32) on a 32x32 map).
    gp = L.global_avg_pool(x, keepdims=True)
    gp = _cbr(s, gp, 256, 1)
    gp = jnp.broadcast_to(gp, p1.shape)
    return jnp.concatenate([conv, p1, p2, p3, gp], axis=-1)


def _head(s: Scope, c5: Array) -> Array:
    """ASPP || SKNet, concatenated and refined (`v3plus.py:309-316`)."""
    sk = sknet_block(s, c5)
    aspp = _aspp(s, c5)
    y = _cbr(s, aspp, 256, 1)
    y = jnp.concatenate([y, sk], axis=-1)
    y = _cbr(s, y, 256, 3)
    y = _cbr(s, y, 256, 3)
    return scse_block(s, y)


def deeplab_v3p(s: Scope, x: Array, num_classes: int = 2) -> Array:
    """Plain Xception-DeepLabv3+ (`v3plus.py:170-350`)."""
    c, c1, c2, c3, c4, c5 = _backbone(s, x, use_bam=False)
    del c3, c4
    y = L.remat_tag(_head(s, c5))

    up1 = L.upsample2d(y, 2)
    y = jnp.concatenate([up1, c2], axis=-1)
    y = _cbr(s, y, 256, 3)
    y = _cbr(s, y, 256, 3)
    y = L.remat_tag(scse_block(s, y))

    up2 = L.conv2d_transpose(s, y, 128, 3, strides=2)
    y = jnp.concatenate([up2, c1], axis=-1)
    y = _cbr(s, y, 128, 3)
    y = _cbr(s, y, 128, 3)
    y = L.remat_tag(scse_block(s, y))

    up3 = L.conv2d_transpose(s, y, 64, 3, strides=2)
    y = jnp.concatenate([c, up3], axis=-1)
    y = _cbr(s, y, 64, 3)
    y = _cbr(s, y, 64, 3)
    y = L.remat_tag(scse_block(s, y))

    y = L.upsample2d(y, 2)
    y = _cbr(s, y, 32, 3)
    y = _cbr(s, y, 32, 3)
    return L.conv2d(s, y, num_classes, 1, activation="softmax")


def deeplab_v3p_bam(s: Scope, x: Array, num_classes: int = 2) -> Array:
    """BAM-augmented Xception-DeepLabv3+ (`bam.py:170-338`)."""
    c, c1, c2, c3, c4, c5 = _backbone(s, x, use_bam=True)
    del c, c3, c4
    y = L.remat_tag(_head(s, c5))

    y = L.upsample2d(y, 2)
    y = jnp.concatenate([c2, y], axis=-1)
    y = _cbr(s, y, 128, 3)
    y = _cbr(s, y, 128, 3)
    y = L.remat_tag(scse_block(s, y))
    y = L.upsample2d(y, 2)

    y = jnp.concatenate([c1, y], axis=-1)
    y = _cbr(s, y, 64, 3)
    y = _cbr(s, y, 64, 3)
    y = L.remat_tag(scse_block(s, y))

    y = L.upsample2d(y, 4)
    return L.conv2d(s, y, num_classes, 1, activation="softmax")
