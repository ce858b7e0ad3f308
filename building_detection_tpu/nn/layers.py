"""Functional NN layers with TF/Keras-parity semantics, NHWC, TPU-first.

Every layer here is a pure function of a :class:`~building_detection_tpu.core.
module.Scope`.  Semantics deliberately match the Keras layers used by the
reference models (`/root/reference/predict_model/*.py`):

* ``SAME`` padding on strided and dilated convolutions follows TF's
  asymmetric convention (extra padding on bottom/right);
* :func:`conv2d_transpose` reproduces ``keras.layers.Conv2DTranspose`` with
  ``padding='same'`` (output = input * stride), implemented as the gradient
  of a forward convolution via ``lax.conv_transpose(transpose_kernel=True)``;
* :func:`batch_norm` uses Keras defaults (momentum 0.99, epsilon 1e-3) and
  moving statistics at inference;
* pooling / nearest upsampling match ``MaxPooling2D`` / ``AveragePooling2D``
  / ``UpSampling2D`` defaults.

bf16 activations accumulate in f32 inside the MXU (TPU hardware behaviour);
we deliberately do NOT set ``preferred_element_type`` on convs — a widened
output dtype breaks the conv transpose rule under autodiff (mixed-dtype dW).
The ONE exception is :func:`_int8_pointwise_matmul`: int8 x int8 needs an
explicit int32 accumulator, and ``_use_int8`` gates it to inference-only
apply mode (``not s.train and s.mode == "apply"``) so it is never
differentiated; any future QAT/saliency path must bypass the int8 branch.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from building_detection_tpu.core.module import Scope

Array = jax.Array

he_normal = jax.nn.initializers.he_normal()
glorot_uniform = jax.nn.initializers.glorot_uniform()
zeros_init = jax.nn.initializers.zeros
ones_init = jax.nn.initializers.ones

_DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _activate(x: Array, activation: Optional[str]) -> Array:
    if activation is None:
        return x
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    if activation == "softmax":
        return jax.nn.softmax(x, axis=-1)
    raise ValueError(f"unknown activation {activation!r}")


def _int8_pointwise_matmul(s: Scope, x: Array, w: Array, site: str) -> Array:
    """1x1 conv as an int8 x int8 -> int32 MXU op, for inference.

    Per-tensor activation scale, static per-output-channel weight scales;
    output dequantized to ``compute_dtype``.  Isolated-matmul chip numbers
    (docs/ARCHITECTURE.md round-3 int8 probes): 1.24x over bf16 at 768
    channels, 1.63x at 2048.  End-to-end those wins do NOT transfer
    (full fused-ensemble measurements, batch 128): quantize/dequant
    elementwise passes at every site boundary offset the MXU gain, so the
    best int8 configuration only TIES bf16 — see the round-3 section of
    docs/ARCHITECTURE.md for the honest numbers.  Three measured design
    rules are baked in here:

    * the int8 op stays in CONV form on NHWC (a reshape-to-2D
      ``dot_general`` forces layout copies: 65.6 vs 72.0 tiles/s);
    * production use needs CALIBRATED static scales (``Scope.int8_scales``
      via :func:`building_detection_tpu.core.module.calibrate_int8`) — a
      dynamic per-call max adds a data-dependent reduce between producer
      and quantize (63.6 tiles/s); sites without a calibrated scale fall
      back to it (numerically safe, slower);
    * only large-channel sites qualify (``int8_pointwise=512``): at
      large-spatial sites the extra int8 activation copy raises peak HBM
      ~6 GB and the batch-128 program OOMs.

    Opt-in: output differs from bf16/f32 at ~1e-2 relative, so mask
    parity is voided.  ``w`` is (kh=1, kw=1, in_ch, out_ch) or
    (in_ch, out_ch).
    """
    in_ch = x.shape[-1]
    w2 = w.reshape(in_ch, -1).astype(jnp.float32)
    if s.int8_scales is not None and site in s.int8_scales:
        # static calibrated scale: quantize has no reduce dependency and
        # fuses into the producing fusion (int8 written straight to HBM)
        sx = jnp.maximum(jnp.float32(s.int8_scales[site]), 1e-8) / 127.0
    else:
        # dynamic per-tensor scale; reduction in f32 but the elementwise
        # quantize stays in compute_dtype: a full f32 activation copy
        # doubled peak HBM and OOM'd the batch-128 fused ensemble (bf16 has
        # 8 mantissa bits — exact for the int8 grid's integers, and the
        # divide's ~0.4% rounding is below the 1/254 quantization step)
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
    if s.int8_amax is not None:
        s.int8_amax[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
    inv_sx = (1.0 / sx).astype(x.dtype)
    xq = jnp.clip(jnp.round(x * inv_sx), -127, 127).astype(jnp.int8)
    sw = jnp.maximum(jnp.max(jnp.abs(w2), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w2 / sw), -127, 127).astype(jnp.int8)
    # conv form on NHWC — XLA's conv->dot rewrite hits the int8 MXU path
    # without the layout copies a host-visible reshape-to-2D dot forces
    # (measured 72.0 vs 65.6 tiles/s on the fused ensemble)
    acc = lax.conv_general_dilated(
        xq,
        wq.reshape(1, 1, in_ch, -1),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.int32,
    )
    # dequant fuses into the conv's consumer; keep the scaled result in
    # compute_dtype so no f32-sized activation ever materialises
    return acc.astype(s.compute_dtype) * (sx * sw).astype(s.compute_dtype)


def _use_int8(s: Scope, in_ch, kh, kw, strides, dilation) -> bool:
    """``Scope.int8_pointwise`` may be bool or an int minimum input-channel
    count.  End-to-end chip measurements (docs/ARCHITECTURE.md round 3):
    the MXU only wins at large K, and at small-K/large-spatial sites the
    extra int8 activation copies add ~6 GB peak HBM (the batch-128 fused
    ensemble OOMs with every site quantized) — use ``512`` to restrict to
    the Xception middle/exit-flow projections where the FLOPs live."""
    flag = getattr(s, "int8_pointwise", False)
    if not flag:
        return False
    min_ch = 1 if flag is True else int(flag)
    return (
        in_ch >= min_ch
        and not s.train
        and s.mode == "apply"
        and (kh, kw) == (1, 1)
        and _pair(strides) == (1, 1)
        and _pair(dilation) == (1, 1)
    )


def conv2d(
    s: Scope,
    x: Array,
    features: int,
    kernel_size: Union[int, Tuple[int, int]],
    strides: Union[int, Tuple[int, int]] = 1,
    padding: str = "SAME",
    dilation: Union[int, Tuple[int, int]] = 1,
    use_bias: bool = True,
    activation: Optional[str] = None,
    kernel_init=glorot_uniform,
    name: Optional[str] = None,
) -> Array:
    """``keras.layers.Conv2D`` equivalent (NHWC, HWIO kernel)."""
    name = s.auto_name("conv2d", name)
    x = x.astype(s.compute_dtype)
    kh, kw = _pair(kernel_size)
    in_ch = x.shape[-1]
    w = s.param(f"{name}/kernel", (kh, kw, in_ch, features), kernel_init)
    if _use_int8(s, in_ch, kh, kw, strides, dilation):
        y = _int8_pointwise_matmul(s, x, w, name)
    else:
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=_pair(strides),
            padding=padding,
            rhs_dilation=_pair(dilation),
            dimension_numbers=_DIMS,
        )
    if use_bias:
        b = s.param(f"{name}/bias", (features,), zeros_init)
        y = y + b
    return _activate(y, activation)


def separable_conv2d(
    s: Scope,
    x: Array,
    features: int,
    kernel_size: Union[int, Tuple[int, int]],
    strides: Union[int, Tuple[int, int]] = 1,
    padding: str = "SAME",
    dilation: Union[int, Tuple[int, int]] = 1,
    use_bias: bool = True,
    activation: Optional[str] = None,
    name: Optional[str] = None,
) -> Array:
    """``keras.layers.SeparableConv2D``: depthwise (multiplier 1) + pointwise.

    Used heavily by the Xception backbones
    (`/root/reference/predict_model/v3plus.py:185-280`).
    """
    name = s.auto_name("separable_conv2d", name)
    x = x.astype(s.compute_dtype)
    kh, kw = _pair(kernel_size)
    in_ch = x.shape[-1]
    dw = s.param(f"{name}/depthwise_kernel", (kh, kw, 1, in_ch), glorot_uniform)
    pw = s.param(f"{name}/pointwise_kernel", (1, 1, in_ch, features), glorot_uniform)
    y = lax.conv_general_dilated(
        x,
        dw,
        window_strides=_pair(strides),
        padding=padding,
        rhs_dilation=_pair(dilation),
        dimension_numbers=_DIMS,
        feature_group_count=in_ch,
    )
    if _use_int8(s, in_ch, 1, 1, 1, 1):
        # depthwise stays bf16 on the VPU; the pointwise projection is the
        # MXU matmul where int8 measured 1.24-1.63x (docs/ARCHITECTURE.md)
        y = _int8_pointwise_matmul(s, y, pw, name)
    else:
        y = lax.conv_general_dilated(
            y,
            pw,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=_DIMS,
        )
    if use_bias:
        b = s.param(f"{name}/bias", (features,), zeros_init)
        y = y + b
    return _activate(y, activation)


def conv2d_transpose(
    s: Scope,
    x: Array,
    features: int,
    kernel_size: Union[int, Tuple[int, int]],
    strides: Union[int, Tuple[int, int]] = 2,
    use_bias: bool = True,
    activation: Optional[str] = None,
    kernel_init=glorot_uniform,
    name: Optional[str] = None,
) -> Array:
    """``keras.layers.Conv2DTranspose(padding='same')``: output = input*stride.

    The kernel is stored TF-style as ``(kh, kw, out_ch, in_ch)`` and applied
    as the gradient of the corresponding forward convolution, which is exactly
    what TF computes (`/root/reference/predict_model/scse.py:71` etc.).
    """
    name = s.auto_name("conv2d_transpose", name)
    x = x.astype(s.compute_dtype)
    kh, kw = _pair(kernel_size)
    in_ch = x.shape[-1]
    w = s.param(f"{name}/kernel", (kh, kw, features, in_ch), kernel_init)
    y = lax.conv_transpose(
        x,
        w,
        strides=_pair(strides),
        padding="SAME",
        dimension_numbers=_DIMS,
        transpose_kernel=True,
    )
    if use_bias:
        b = s.param(f"{name}/bias", (features,), zeros_init)
        y = y + b
    return _activate(y, activation)


def dense(
    s: Scope,
    x: Array,
    features: int,
    use_bias: bool = True,
    activation: Optional[str] = None,
    kernel_init=glorot_uniform,
    name: Optional[str] = None,
) -> Array:
    name = s.auto_name("dense", name)
    x = x.astype(s.compute_dtype)
    w = s.param(f"{name}/kernel", (x.shape[-1], features), kernel_init)
    y = jnp.dot(x, w)
    if use_bias:
        b = s.param(f"{name}/bias", (features,), zeros_init)
        y = y + b
    return _activate(y, activation)


def batch_norm(
    s: Scope,
    x: Array,
    momentum: float = 0.99,
    epsilon: float = 1e-3,
    name: Optional[str] = None,
) -> Array:
    """``keras.layers.BatchNormalization`` over the channel axis.

    Inference uses moving statistics; training uses batch statistics and
    updates the moving averages with Keras' convention
    ``moving = moving * momentum + batch * (1 - momentum)``.
    """
    name = s.auto_name("batch_normalization", name)
    x = x.astype(s.compute_dtype)
    ch = x.shape[-1]
    gamma = s.param(f"{name}/gamma", (ch,), ones_init)
    beta = s.param(f"{name}/beta", (ch,), zeros_init)
    moving_mean = s.get_state(f"{name}/moving_mean", (ch,), lambda r, sh, d: jnp.zeros(sh, d))
    moving_var = s.get_state(f"{name}/moving_variance", (ch,), lambda r, sh, d: jnp.ones(sh, d))

    if s.train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x.astype(jnp.float32), axis=axes)
        var = jnp.var(x.astype(jnp.float32), axis=axes)
        # Keras normalizes with the biased batch variance; what it feeds the
        # moving-variance EMA depends on the execution path: the FUSED batch
        # norm (4-D inputs) reports the UNBIASED variance (Bessel N/(N-1)
        # over the reduced sample count), while the non-fused path (2-D
        # inputs — the zoo's SE/BAM channel gates operate on (B, C) Dense
        # outputs, `predict_model/res34.py:90-105`, `bam.py:20-34`) uses the
        # BIASED one.  Both verified empirically against real tf_keras 2.21
        # (scripts/tf_train_parity_probe.py for 4-D; the rank experiment in
        # scripts/tf_model_grad_parity.py's round-5 finding for 2-D, where
        # n=batch makes the distinction a 33% effect at batch 4).
        n = 1
        for a in axes:
            n *= x.shape[a]
        bessel = float(n) / float(n - 1) if x.ndim == 4 and n > 1 else 1.0
        s.put_state(
            f"{name}/moving_mean", moving_mean * momentum + mean * (1.0 - momentum)
        )
        s.put_state(
            f"{name}/moving_variance",
            moving_var * momentum + (var * bessel) * (1.0 - momentum),
        )
    else:
        mean = moving_mean.astype(jnp.float32)
        var = moving_var.astype(jnp.float32)

    mean = mean.astype(x.dtype)
    inv = (lax.rsqrt(var + epsilon)).astype(x.dtype) * gamma
    return (x - mean) * inv + beta


def max_pool(
    x: Array,
    pool_size: Union[int, Tuple[int, int]] = 2,
    strides: Optional[Union[int, Tuple[int, int]]] = None,
    padding: str = "VALID",
) -> Array:
    """``keras.layers.MaxPooling2D`` (default pool 2, stride=pool, valid)."""
    ph, pw = _pair(pool_size)
    sh, sw = _pair(strides) if strides is not None else (ph, pw)
    if (sh > ph or sw > pw) and padding == "VALID":
        # Gapped pooling (e.g. MaxPool2D(strides=4) in res34's
        # low_to_high_feature): reduce_window with stride > window has no
        # autodiff linearization rule, so take the max over strided slices —
        # identical values, fully differentiable.
        h, w = x.shape[1], x.shape[2]
        oh = (h - ph) // sh + 1
        ow = (w - pw) // sw + 1
        out = None
        for dy in range(ph):
            for dx in range(pw):
                v = x[:, dy : dy + sh * (oh - 1) + 1 : sh, dx : dx + sw * (ow - 1) + 1 : sw, :]
                out = v if out is None else jnp.maximum(out, v)
        return out
    # NOTE: init must be a Python scalar — an array init degrades the op to a
    # generic reduce_window with no autodiff linearization rule.
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg_inf = -float("inf")
    else:
        neg_inf = int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, ph, pw, 1),
        window_strides=(1, sh, sw, 1),
        padding=padding,
    )


def avg_pool(
    x: Array,
    pool_size: Union[int, Tuple[int, int]],
    strides: Optional[Union[int, Tuple[int, int]]] = None,
    padding: str = "VALID",
) -> Array:
    ph, pw = _pair(pool_size)
    sh, sw = _pair(strides) if strides is not None else (ph, pw)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, ph, pw, 1),
        window_strides=(1, sh, sw, 1),
        padding=padding,
    )
    return (summed / float(ph * pw)).astype(x.dtype)


def global_avg_pool(x: Array, keepdims: bool = False) -> Array:
    """``GlobalAveragePooling2D``: (B,H,W,C) -> (B,C) (or (B,1,1,C))."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims).astype(x.dtype)


def upsample2d(x: Array, size: Union[int, Tuple[int, int]] = 2) -> Array:
    """``UpSampling2D`` with nearest-neighbour interpolation (Keras default)."""
    sh, sw = _pair(size)
    x = jnp.repeat(x, sh, axis=1)
    x = jnp.repeat(x, sw, axis=2)
    return x


def remat_tag(x: Array, name: str = "stage") -> Array:
    """Tag a stage boundary for selective rematerialisation.

    Identity in every forward path.  Under ``Trainer(remat=True)`` the whole
    forward is wrapped in ``jax.checkpoint(policy=save_only_these_names
    ('stage'))``: only tagged values are SAVED for the backward and
    everything between tags is recomputed stage-by-stage — true per-stage
    remat without restructuring the model functions (a naked
    ``jax.checkpoint`` around the whole forward recomputes every
    intermediate before the backward and saves no peak memory; measured,
    BASELINE.md).  Tags create no parameters, so the Keras ``.h5``
    importer's construction-order tape is unaffected.
    """
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, name)


def relu(x: Array) -> Array:
    return jax.nn.relu(x)


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def softmax(x: Array, axis: int = -1) -> Array:
    return jax.nn.softmax(x, axis=axis)
