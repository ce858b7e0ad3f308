"""Training-step parity vs REAL tf_keras: loss, gradients, BN updates.

The forward path is pinned against the reference models built verbatim
under tf_keras (`scripts/tf_oracle_probe.py`).  This probe pins the
TRAINING semantics the reference harness relies on
(`/root/reference/train_model/res34.py:663-678`): training-mode
BatchNormalization (batch statistics + Keras' moving-average update),
the edge_focal_loss value (`res34.py:344-356`), and the gradients of
every trainable weight — computed by tf.GradientTape on a small Keras
model vs ``jax.grad`` on the equivalent
:mod:`building_detection_tpu.nn.layers` model with identical weights.

The probe model covers every layer type the zoo trains: Conv2D (biasless
+ biased 1x1 softmax head), BatchNormalization, MaxPooling2D,
SeparableConv2D (depthwise layout transposed, as in the .h5 importer),
Conv2DTranspose.  Run standalone (CPU, ~30 s):

    python scripts/tf_train_parity_probe.py

Exits 0 and prints PASS lines on parity; nonzero with the failing tensor
otherwise.  Invoked by ``tests/test_tf_oracle.py`` in a subprocess
(Keras name counters are process-global).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import numpy as np


def build_tf_model():
    from tf_keras import Input, Model, layers

    inp = Input((32, 32, 3))
    x = layers.Conv2D(8, 3, padding="same", use_bias=False)(inp)
    x = layers.BatchNormalization()(x)
    x = layers.Activation("relu")(x)
    x = layers.MaxPooling2D()(x)
    x = layers.SeparableConv2D(16, 3, padding="same")(x)
    x = layers.BatchNormalization()(x)
    x = layers.Activation("relu")(x)
    x = layers.Conv2DTranspose(8, 2, strides=2, padding="same")(x)
    x = layers.Conv2D(2, 1, activation="softmax")(x)
    return Model(inp, x)


def jax_model(s, x):
    from building_detection_tpu.nn import layers as L
    import jax

    x = L.conv2d(s, x, 8, 3, use_bias=False)
    x = L.batch_norm(s, x)
    x = jax.nn.relu(x)
    x = L.max_pool(x)
    x = L.separable_conv2d(s, x, 16, 3)
    x = L.batch_norm(s, x)
    x = jax.nn.relu(x)
    x = L.conv2d_transpose(s, x, 8, 2, strides=2)
    x = L.conv2d(s, x, 2, 1, activation="softmax")
    return x


def main() -> int:
    rng = np.random.RandomState(0)
    xb = (rng.rand(4, 32, 32, 3).astype(np.float32) * 2.0) - 1.0
    cls = (rng.rand(4, 32, 32) < 0.4).astype(np.float32)
    y_true = np.stack(
        [
            1.0 - cls,
            cls,
            np.where(rng.rand(4, 32, 32) < 0.3, 2.0, 1.0),
            np.where(rng.rand(4, 32, 32) < 0.3, 2.0, 1.0),
        ],
        axis=-1,
    ).astype(np.float32)

    # ---- TF side ------------------------------------------------------
    import tensorflow as tf

    model = build_tf_model()
    # snapshot ALL variables BEFORE the training call: the call updates
    # BN moving stats in place, and our side must start from the same
    # pre-step state
    tfw = {v.name: v.numpy().copy() for v in model.variables}

    cw = tf.constant([0.35, 0.65], tf.float32)

    with tf.GradientTape() as tape:
        pred = model(tf.constant(xb), training=True)
        y = y_true[..., :2]
        edge = y_true[..., 2:4]
        # literal reference formula (`train_model/res34.py:344-356`)
        loss = cw * edge * y * (1.0 - pred) ** 2 * tf.math.log(pred + 1e-7)
        loss = -tf.reduce_mean(tf.reduce_sum(loss, axis=-1))
    tf_grads = tape.gradient(loss, model.trainable_variables)
    tf_grads = {
        v.name: g.numpy() for v, g in zip(model.trainable_variables, tf_grads)
    }
    tf_pred = pred.numpy()
    tf_loss = float(loss.numpy())
    moving_after = {
        v.name: v.numpy().copy() for v in model.variables if "moving" in v.name
    }

    # ---- JAX side -----------------------------------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from building_detection_tpu.core import module as M
    from building_detection_tpu.train.losses import edge_focal_loss

    params, state = M.init(jax_model, jax.random.key(0), jnp.asarray(xb))

    # transfer the PRE-step TF weights (snapshotted above), transposing
    # the depthwise kernel layout exactly as
    # train/checkpoint.py::import_h5_weights does
    def w(name):
        return tfw[name]

    new_params = {
        "conv2d/kernel": w("conv2d/kernel:0"),
        "batch_normalization/gamma": w("batch_normalization/gamma:0"),
        "batch_normalization/beta": w("batch_normalization/beta:0"),
        "separable_conv2d/depthwise_kernel": np.transpose(
            w("separable_conv2d/depthwise_kernel:0"), (0, 1, 3, 2)
        ),
        "separable_conv2d/pointwise_kernel": w(
            "separable_conv2d/pointwise_kernel:0"
        ),
        "separable_conv2d/bias": w("separable_conv2d/bias:0"),
        "batch_normalization_1/gamma": w("batch_normalization_1/gamma:0"),
        "batch_normalization_1/beta": w("batch_normalization_1/beta:0"),
        "conv2d_transpose/kernel": w("conv2d_transpose/kernel:0"),
        "conv2d_transpose/bias": w("conv2d_transpose/bias:0"),
        "conv2d_1/kernel": w("conv2d_1/kernel:0"),
        "conv2d_1/bias": w("conv2d_1/bias:0"),
    }
    assert set(new_params) == set(params), (
        sorted(params),
        sorted(new_params),
    )
    for k in params:
        assert params[k].shape == new_params[k].shape, (
            k,
            params[k].shape,
            new_params[k].shape,
        )
    params = {k: jnp.asarray(v) for k, v in new_params.items()}
    new_state = {
        "batch_normalization/moving_mean": w(
            "batch_normalization/moving_mean:0"
        ),
        "batch_normalization/moving_variance": w(
            "batch_normalization/moving_variance:0"
        ),
        "batch_normalization_1/moving_mean": w(
            "batch_normalization_1/moving_mean:0"
        ),
        "batch_normalization_1/moving_variance": w(
            "batch_normalization_1/moving_variance:0"
        ),
    }
    assert set(new_state) == set(state)
    state = {k: jnp.asarray(v) for k, v in new_state.items()}

    yt = jnp.asarray(y_true)

    def loss_fn(p):
        pred, new_state = M.apply(
            jax_model, p, state, jnp.asarray(xb), train=True,
            rng=jax.random.key(1),
        )
        return edge_focal_loss(yt, pred), (pred, new_state)

    (jax_loss, (jax_pred, jax_state)), jax_grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)

    # ---- compare ------------------------------------------------------
    failures = []

    def check(label, a, b, atol):
        diff = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        status = "PASS" if diff <= atol else "FAIL"
        print(f"{status} {label}: max|diff| = {diff:.3e} (atol {atol:g})")
        if diff > atol:
            failures.append(label)

    check("training-mode forward", jax_pred, tf_pred, 1e-5)
    check("edge_focal_loss value", jax_loss, tf_loss, 1e-6)

    grad_map = {
        "conv2d/kernel": ("conv2d/kernel:0", None),
        "batch_normalization/gamma": ("batch_normalization/gamma:0", None),
        "batch_normalization/beta": ("batch_normalization/beta:0", None),
        "separable_conv2d/depthwise_kernel": (
            "separable_conv2d/depthwise_kernel:0",
            (0, 1, 3, 2),
        ),
        "separable_conv2d/pointwise_kernel": (
            "separable_conv2d/pointwise_kernel:0",
            None,
        ),
        "separable_conv2d/bias": ("separable_conv2d/bias:0", None),
        "batch_normalization_1/gamma": ("batch_normalization_1/gamma:0", None),
        "batch_normalization_1/beta": ("batch_normalization_1/beta:0", None),
        "conv2d_transpose/kernel": ("conv2d_transpose/kernel:0", None),
        "conv2d_transpose/bias": ("conv2d_transpose/bias:0", None),
        "conv2d_1/kernel": ("conv2d_1/kernel:0", None),
        "conv2d_1/bias": ("conv2d_1/bias:0", None),
    }
    for ours, (theirs, perm) in grad_map.items():
        g_tf = tf_grads[theirs]
        if perm is not None:
            g_tf = np.transpose(g_tf, perm)
        g_us = np.asarray(jax_grads[ours])
        scale = max(float(np.max(np.abs(g_tf))), 1e-12)
        if ours == "separable_conv2d/bias":
            # a bias immediately consumed by BatchNormalization has a
            # mathematically ZERO gradient (BN subtracts the batch mean,
            # cancelling any constant shift); both sides produce ~1e-7
            # reduction noise around 0, so compare absolutely.  The
            # reference models carry exactly this pattern (conv bias
            # before BN throughout `predict_model/*.py`).
            check(f"grad {ours} (mathematically 0)", g_us, g_tf, atol=1e-6)
            continue
        check(f"grad {ours}", g_us, g_tf, atol=1e-5 * scale + 1e-7)

    for ours, theirs in (
        ("batch_normalization/moving_mean", "batch_normalization/moving_mean:0"),
        (
            "batch_normalization/moving_variance",
            "batch_normalization/moving_variance:0",
        ),
        (
            "batch_normalization_1/moving_mean",
            "batch_normalization_1/moving_mean:0",
        ),
        (
            "batch_normalization_1/moving_variance",
            "batch_normalization_1/moving_variance:0",
        ),
    ):
        check(f"BN update {ours}", jax_state[ours], moving_after[theirs], 1e-6)

    # ---- optimizer trajectory: 5 Adam steps, distinct batches ---------
    # The trainer uses train/optim.py::keras_adam because optax.adam's
    # epsilon placement differs from Keras'; this pins the multi-step
    # weight trajectory against the real tf_keras Adam (the optimizer the
    # reference compiles, `train_model/res34.py:663-666`), driven by the
    # reference's per-batch warmup-cosine LR callback semantics
    # (`res34.py:534-568`: on_batch_begin sets lr(global_step) with the
    # 0-based PRE-increment step — the same indexing keras_adam uses for
    # a callable schedule).
    import tf_keras

    n_steps = 5
    lr_base, warmup_lr, warmup_steps_n = 1e-3, 1e-5, 2

    def ref_lr(global_step):
        # literal transcription of cosine_decay_with_warmup
        # (`train_model/res34.py:512-531`), numpy f64 like the reference
        if global_step >= warmup_steps_n:
            lr = 0.5 * lr_base * (
                1
                + np.cos(
                    np.pi
                    * (global_step - warmup_steps_n)
                    / float(n_steps - warmup_steps_n)
                )
            )
            return max(lr, 0.0)
        k = (lr_base - warmup_lr) / warmup_steps_n
        return max(k * global_step + warmup_lr, 0.0)
    batches = [
        ((rng.rand(4, 32, 32, 3).astype(np.float32) * 2.0) - 1.0)
        for _ in range(n_steps)
    ]
    targets = []
    for _ in range(n_steps):
        c = (rng.rand(4, 32, 32) < 0.4).astype(np.float32)
        targets.append(
            np.stack(
                [
                    1.0 - c,
                    c,
                    np.where(rng.rand(4, 32, 32) < 0.3, 2.0, 1.0),
                    np.where(rng.rand(4, 32, 32) < 0.3, 2.0, 1.0),
                ],
                axis=-1,
            ).astype(np.float32)
        )

    # TF side: restore the pre-step snapshot, then 5 optimizer steps
    for v in model.variables:
        v.assign(tfw[v.name])
    opt = tf_keras.optimizers.Adam(learning_rate=1e-3, epsilon=1e-7)
    for step_i, (xb_i, yt_i) in enumerate(zip(batches, targets)):
        # K.set_value(model.optimizer.lr, …) on_batch_begin (`res34.py:558`)
        opt.learning_rate.assign(np.float32(ref_lr(step_i)))
        with tf.GradientTape() as tape:
            pred = model(tf.constant(xb_i), training=True)
            y = yt_i[..., :2]
            edge = yt_i[..., 2:4]
            l = cw * edge * y * (1.0 - pred) ** 2 * tf.math.log(pred + 1e-7)
            l = -tf.reduce_mean(tf.reduce_sum(l, axis=-1))
        g = tape.gradient(l, model.trainable_variables)
        opt.apply_gradients(zip(g, model.trainable_variables))
    tf_final = {v.name: v.numpy().copy() for v in model.variables}

    # JAX side: same start, same batches, keras_adam + our schedule
    import optax

    from building_detection_tpu.train.optim import keras_adam
    from building_detection_tpu.train.schedule import warmup_cosine

    p_t = {k: jnp.asarray(v) for k, v in new_params.items()}
    s_t = {k: jnp.asarray(v) for k, v in new_state.items()}
    tx = keras_adam(
        warmup_cosine(
            lr_base,
            n_steps,
            warmup_learning_rate=warmup_lr,
            warmup_steps=warmup_steps_n,
        )
    )
    opt_state = tx.init(p_t)

    @jax.jit
    def train_step(p, s, o, xb_i, yt_i):
        def lf(p):
            pred, ns = M.apply(
                jax_model, p, s, xb_i, train=True, rng=jax.random.key(1)
            )
            return edge_focal_loss(yt_i, pred), ns

        grads, ns = jax.grad(lf, has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), ns, o

    for xb_i, yt_i in zip(batches, targets):
        p_t, s_t, opt_state = train_step(
            p_t, s_t, opt_state, jnp.asarray(xb_i), jnp.asarray(yt_i)
        )

    traj_map = dict(grad_map)
    for ours, theirs in (
        ("batch_normalization/moving_mean", "batch_normalization/moving_mean:0"),
        (
            "batch_normalization/moving_variance",
            "batch_normalization/moving_variance:0",
        ),
        (
            "batch_normalization_1/moving_mean",
            "batch_normalization_1/moving_mean:0",
        ),
        (
            "batch_normalization_1/moving_variance",
            "batch_normalization_1/moving_variance:0",
        ),
    ):
        traj_map[ours] = (theirs, None)
    merged = dict(p_t)
    merged.update(s_t)
    for ours, (theirs, perm) in traj_map.items():
        w_tf = tf_final[theirs]
        if perm is not None:
            w_tf = np.transpose(w_tf, perm)
        scale = max(float(np.max(np.abs(w_tf))), 1e-12)
        if ours == "separable_conv2d/bias":
            # zero-gradient weight (bias consumed by BN): Adam divides
            # ~1e-8 reduction noise by sqrt(v)+eps ~ 1e-7, amplifying it
            # to near-lr-sized steps whose DIRECTION is float-noise on
            # both sides — trajectories cannot match elementwise.  Bound
            # the drift by n_steps*lr instead (both sides random-walk
            # around the start; the weight is a mathematical no-op).
            check(
                f"adam x{n_steps} {ours} (zero-grad drift bound)",
                np.asarray(merged[ours]),
                w_tf,
                atol=n_steps * 1e-3,
            )
            continue
        atol = 1e-5 * scale + 1e-6
        if ours == "batch_normalization_1/moving_mean":
            # This BN normalizes separable_conv2d's output, so its moving
            # mean tracks mean(x) + bias — and that bias is the zero-grad
            # random-walk bounded above: per-step trajectories can sit up
            # to ~2*t*lr apart between frameworks.  The EMA (momentum m)
            # integrates that drift: dominant term (1-m^n)*2*n*lr ~ 4.9e-4
            # plus the bias-motion residual (1-m)*lr*n*(n-1) ~ 2e-4.
            # Without this allowance the check flakes at ~2e-6 on runs
            # where TF's nondeterministic reductions tip the walk.
            atol += (1.0 - 0.99 ** n_steps) * (2 * n_steps * 1e-3) + (
                1.0 - 0.99
            ) * 1e-3 * n_steps * (n_steps - 1)
        check(
            f"adam x{n_steps} {ours}",
            np.asarray(merged[ours]),
            w_tf,
            atol=atol,
        )

    if failures:
        print(f"TRAIN PARITY: FAIL ({len(failures)}): {failures}")
        return 1
    print("TRAIN PARITY: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
