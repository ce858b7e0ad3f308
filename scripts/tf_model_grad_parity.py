"""Per-model gradient + optimizer-trajectory parity vs REAL tf_keras.

`scripts/tf_train_parity_probe.py` pins training semantics (training-mode
BN, edge_focal_loss, gradients, the Keras-Adam trajectory) on one synthetic
cover model spanning every trained layer TYPE.  This probe closes the
remaining evidential gap (round-4 VERDICT item 3): it asserts gradient- and
trajectory-level parity on EACH of the five real architectures — the
compiled recipe of `/root/reference/train_model/res34.py:663-678` and its
four clones — by driving the UNMODIFIED reference models under tf_keras
against our zoo with identical weights, batches and LR schedule.

Per model (subprocess-isolated TF leg; Keras name counters are
process-global):

1. TF: build the reference model at 128 px (`tf_oracle._BUILDERS`; for
   v3plus/bam the hard-coded ``AveragePooling2D(32)`` image pooling becomes
   pool 8 — the exact global-pooling equivalence at this size, see
   `scripts/tf_convergence_floor.py`), save ``pre.h5``.
2. TF: compute step-1 gradients of the literal edge_focal_loss
   (`res34.py:344-356`) under ``tf.GradientTape``; persist them WITHOUT any
   name mapping by saving ``grads.h5`` with every trainable variable
   assigned ``var + grad`` (restored afterwards).
3. TF: run 4 Keras-Adam steps with the reference's per-batch warmup-cosine
   LR assignment (`res34.py:512-585`), save ``post.h5`` + per-step losses.
4. Ours: import ``pre.h5`` through the strict all-or-nothing importer
   (`train/checkpoint.py::import_h5_weights`), take ``jax.grad`` of our
   edge_focal_loss, and compare per-tensor against ``grads.h5 - pre.h5``
   (the importer supplies the name space — no hand mapping).
5. Ours: run the same 4 steps with ``keras_adam(warmup_cosine)`` and
   compare EVERY weight and BN moving stat against ``post.h5``, plus the
   per-step losses.

A wrong layer semantic, gradient rule, BN update, optimizer epsilon or LR
indexing in ANY of the five architectures fails one of these comparisons.

Zero-gradient caveat (same as the cover probe): a conv bias immediately
consumed by BatchNormalization has a mathematically zero gradient; Adam
amplifies each framework's ~1e-8 reduction noise into lr-sized random
walks whose direction is float noise, and BN moving means track the walk.
Those tensors are compared against drift bounds instead of elementwise.

Tolerances are SELF-CALIBRATED per tensor: the TF leg computes the same
gradients a second time on a permuted batch (mathematically identical —
BN batch statistics, the loss and all gradients are permutation-
invariant; only f32 reduction orders change), and |g - g_perm| measures
the architecture's own noise amplification at each tensor (res34's
~70-conv backward reaches ~1e-3 relative at the stem).  Cross-framework
diffs are allowed 10x that floor; a semantic bug produces diffs on the
order of the gradient itself, far above.

Usage:
    python scripts/tf_model_grad_parity.py [model ...]     # default: all 5
    python scripts/tf_model_grad_parity.py --tf-leg NAME WORKDIR  # internal

Exits 0 with per-model PASS lines; nonzero naming the failing tensor.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

HW = 128
BATCH = 4
N_STEPS = 4
WARMUP_STEPS = 2
LR_BASE = 1e-3
WARMUP_LR = 1e-5
BN_MOMENTUM = 0.99


def ref_lr(global_step: int) -> float:
    """Literal `cosine_decay_with_warmup` (`train_model/res34.py:512-531`),
    0-based pre-increment step (`res34.py:558-568`)."""
    if global_step >= WARMUP_STEPS:
        lr = 0.5 * LR_BASE * (
            1 + np.cos(
                np.pi * (global_step - WARMUP_STEPS)
                / float(N_STEPS - WARMUP_STEPS)
            )
        )
        return max(float(lr), 0.0)
    k = (LR_BASE - WARMUP_LR) / WARMUP_STEPS
    return max(float(k * global_step + WARMUP_LR), 0.0)


def make_batches(seed: int = 0):
    """Shared data: blobby scenes + rectangle labels (nontrivial edges)."""
    rng = np.random.RandomState(seed)
    xs, labs = [], []
    for _ in range(N_STEPS):
        img = rng.randint(0, 60, (BATCH, HW, HW, 3)).astype(np.uint8)
        lab = np.zeros((BATCH, HW, HW), np.uint8)
        for i in range(BATCH):
            for _ in range(rng.randint(2, 5)):
                x, y = rng.randint(0, HW - 40, 2)
                w, h = rng.randint(12, 40, 2)
                img[i, y : y + h, x : x + w] = rng.randint(150, 255, 3)
                lab[i, y : y + h, x : x + w] = 1
        xs.append((img / 127.5 - 1.0).astype(np.float32))
        labs.append(lab)
    return xs, labs


# --------------------------------------------------------------------------
# TF leg (subprocess)
# --------------------------------------------------------------------------
def tf_leg(name: str, work: str) -> int:
    from tests import tf_oracle  # sets TF_USE_LEGACY_KERAS before TF import

    import cv2 as cv
    import tensorflow as tf
    import tf_keras
    from tf_keras import backend as K

    tf_keras.utils.set_random_seed(0)
    fname, _ = tf_oracle._BUILDERS[name]
    mod = tf_oracle._load_reference_module(fname)
    feat = HW // 16  # reference output stride 16
    orig_ap = tf.keras.layers.AveragePooling2D
    orig_up = tf.keras.layers.UpSampling2D

    def AP(pool_size=(2, 2), **kw):
        return orig_ap(pool_size=feat if pool_size == 32 else pool_size, **kw)

    def UP(size=(2, 2), **kw):
        return orig_up(size=feat if size == 32 else size, **kw)

    tf.keras.layers.AveragePooling2D, tf.keras.layers.UpSampling2D = AP, UP
    try:
        if name == "res34":
            model = mod.ResNetFamily((HW, HW, 3)).run_model("res34")
        elif name == "scse":
            model = mod.UNet(2, (HW, HW, 3))
        elif name == "hrnet":
            model = mod.HRNet(shape=(HW, HW, 3))
        elif name == "v3plus":
            model = mod.Xception_DeepLabV3_Plus(shape=(HW, HW, 3))
        elif name == "bam":
            model = mod.Xception_DeepLabV3_Plus_bam(shape=(HW, HW, 3))
        else:
            raise ValueError(name)
    finally:
        tf.keras.layers.AveragePooling2D = orig_ap
        tf.keras.layers.UpSampling2D = orig_up

    model.save_weights(os.path.join(work, "pre.h5"))

    xs, labs = make_batches()

    def to_targets(lab_batch):
        # reference feeder recipe (`train_model/res34.py:76-104`): one-hot +
        # 3x3 erode/dilate x5 edge bands at weight 2
        n = len(lab_batch)
        out = np.zeros((n, HW, HW, 4), np.float32)
        kernel = np.ones((3, 3), np.uint8)
        for i, lab in enumerate(lab_batch):
            b = lab.astype(np.uint8)
            erode = cv.erode(b, kernel, iterations=5)
            p_edge = np.where((b - erode) == 1, 2.0, 1.0)
            dilate = cv.dilate(b, kernel, iterations=5)
            f_edge = np.where((dilate - b) == 1, 2.0, 1.0)
            out[i, ..., 0] = 1.0 - b
            out[i, ..., 1] = b
            out[i, ..., 2] = f_edge
            out[i, ..., 3] = p_edge
        return out

    ys = [to_targets(lab) for lab in labs]
    np.savez_compressed(
        os.path.join(work, "targets.npz"),
        **{f"y{i}": y for i, y in enumerate(ys)},
    )

    cw = tf.constant([0.35, 0.65], tf.float32)

    def loss_of(pred, y_full):
        y = y_full[..., :2]
        edge = y_full[..., 2:4]
        # literal reference formula (`train_model/res34.py:344-356`)
        loss = cw * edge * y * (1.0 - pred) ** 2 * tf.math.log(pred + 1e-7)
        return -tf.reduce_mean(tf.reduce_sum(loss, axis=-1))

    # ---- step-1 gradients, persisted as (var + grad) in grads.h5 ----------
    snapshot = [v.numpy().copy() for v in model.variables]
    with tf.GradientTape() as tape:
        pred = model(tf.constant(xs[0]), training=True)
        loss0 = loss_of(pred, ys[0])
    grads = tape.gradient(loss0, model.trainable_variables)
    # the training=True call above already advanced BN moving stats; restore
    # EVERYTHING so grads.h5 = pre + grad exactly, then re-restore for the
    # trajectory run
    for v, w in zip(model.variables, snapshot):
        v.assign(w)
    for v, g in zip(model.trainable_variables, grads):
        v.assign_add(g)
    model.save_weights(os.path.join(work, "grads.h5"))
    for v, w in zip(model.variables, snapshot):
        v.assign(w)

    # ---- TF's OWN per-tensor gradient noise floor --------------------------
    # The same gradients computed on a PERMUTED batch: BN batch statistics,
    # the loss, and every gradient are mathematically permutation-invariant
    # — only reduction orders change.  |g - g_perm| per tensor is the
    # intrinsic f32 noise the deep backward amplifies (on res34's ~70-conv
    # backward it reaches ~1e-3 relative at the stem), and calibrates the
    # cross-framework tolerances self-consistently per architecture.
    perm = [3, 1, 0, 2]
    with tf.GradientTape() as tape:
        pred_p = model(tf.constant(xs[0][perm]), training=True)
        loss_p = loss_of(pred_p, ys[0][perm])
    grads_p = tape.gradient(loss_p, model.trainable_variables)
    for v, w in zip(model.variables, snapshot):
        v.assign(w)
    for v, g in zip(model.trainable_variables, grads_p):
        v.assign_add(g)
    model.save_weights(os.path.join(work, "grads_perm.h5"))
    for v, w in zip(model.variables, snapshot):
        v.assign(w)

    # ---- 4-step Keras-Adam trajectory with the reference LR callback ------
    def run_trajectory(permute: bool):
        opt = tf_keras.optimizers.Adam(learning_rate=LR_BASE, epsilon=1e-7)
        losses = []
        for step in range(N_STEPS):
            opt.learning_rate.assign(np.float32(ref_lr(step)))
            x_s, y_s = xs[step], ys[step]
            if permute:
                x_s, y_s = x_s[perm], y_s[perm]
            with tf.GradientTape() as tape:
                pred = model(tf.constant(x_s), training=True)
                l = loss_of(pred, y_s)
            g = tape.gradient(l, model.trainable_variables)
            opt.apply_gradients(zip(g, model.trainable_variables))
            losses.append(float(l.numpy()))
            if step == 0 and not permute:
                # post-step-1 snapshot: weights were IDENTICAL at step
                # start, so every param update and BN moving-stat update is
                # directly comparable with no chaos compounding — the sharp
                # per-step assertion (the 4-step end state is only sanity-
                # bounded; see ours_leg)
                model.save_weights(os.path.join(work, "post1.h5"))
        return losses

    losses = run_trajectory(permute=False)
    model.save_weights(os.path.join(work, "post.h5"))
    # TF's OWN trajectory chaos floor: the identical 4 steps on per-step
    # permuted batches (same math, different reduction orders).  Adam +
    # a deep backward amplify the per-step noise chaotically, so the
    # elementwise weight spread after 4 steps is the honest comparison
    # scale for the cross-framework trajectory diff.
    for v, w in zip(model.variables, snapshot):
        v.assign(w)
    losses_p = run_trajectory(permute=True)
    model.save_weights(os.path.join(work, "post_perm.h5"))
    with open(os.path.join(work, "tf_result.json"), "w") as f:
        json.dump({
            "losses": losses,
            "losses_perm": losses_p,
            "loss0": float(loss0.numpy()),
        }, f)
    print(f"tf leg {name}: losses={['%.6f' % l for l in losses]}")
    print(f"tf leg {name}: perm  ={['%.6f' % l for l in losses_p]}")
    return 0


# --------------------------------------------------------------------------
# our leg + comparison
# --------------------------------------------------------------------------
def ours_leg(name: str, work: str) -> list:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from building_detection_tpu.core import module as M
    from building_detection_tpu.models.registry import MODEL_REGISTRY, init_model
    from building_detection_tpu.train.checkpoint import import_h5_weights
    from building_detection_tpu.train.losses import edge_focal_loss
    from building_detection_tpu.train.optim import keras_adam
    from building_detection_tpu.train.schedule import warmup_cosine

    model_fn = MODEL_REGISTRY[name]
    params0, state0 = init_model(name, jax.random.key(0), (1, HW, HW, 3))
    params, state, _ = import_h5_weights(
        os.path.join(work, "pre.h5"), params0, state0
    )
    gparams, _, _ = import_h5_weights(
        os.path.join(work, "grads.h5"), params0, state0
    )
    gparams_p, _, _ = import_h5_weights(
        os.path.join(work, "grads_perm.h5"), params0, state0
    )
    tf_grads, tf_noise = {}, {}
    for k in params:
        base = np.asarray(params[k], np.float64)
        g1 = np.asarray(gparams[k], np.float64) - base
        g2 = np.asarray(gparams_p[k], np.float64) - base
        tf_grads[k] = g1
        # TF-vs-TF spread on the permuted (mathematically identical) batch:
        # the architecture's own amplified f32 noise at this tensor
        tf_noise[k] = float(np.max(np.abs(g1 - g2)))

    xs, labs = make_batches()
    with np.load(os.path.join(work, "targets.npz")) as z:
        ys = [z[f"y{i}"] for i in range(N_STEPS)]
    with open(os.path.join(work, "tf_result.json")) as f:
        tf_res = json.load(f)

    def loss_fn(p, s, x, y):
        pred, ns = M.apply(
            model_fn, p, s, x, train=True, rng=jax.random.key(1)
        )
        return edge_focal_loss(y, pred), ns

    grad_step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (loss0, _), our_grads = grad_step(
        params, state, jnp.asarray(xs[0]), jnp.asarray(ys[0])
    )
    # OUR self-noise under the same weak perturbation (permuted batch):
    # where a tensor's gradient is intrinsically noise-amplified (e.g.
    # decoder convs behind the SKNet softmax + scSE gates), BOTH
    # frameworks' self-spreads show it, and the cross-framework bound must
    # include whichever is larger.
    perm = [3, 1, 0, 2]
    (_, _), our_grads_p = grad_step(
        params, state, jnp.asarray(xs[0][perm]), jnp.asarray(ys[0][perm])
    )
    our_noise = {
        k: float(np.max(np.abs(
            np.asarray(our_grads[k], np.float64)
            - np.asarray(our_grads_p[k], np.float64)
        )))
        for k in params
    }

    failures = []

    def check(label, a, b, atol):
        diff = float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))) if np.size(a) else 0.0
        status = "PASS" if diff <= atol else "FAIL"
        print(f"{status} {name} {label}: max|diff|={diff:.3e} (atol {atol:g})")
        if diff > atol:
            failures.append(f"{name}:{label}")

    check("loss step0", loss0, tf_res["loss0"], 2e-6)

    # -- gradient comparison, every trainable tensor ------------------------
    n_zero = 0
    worst = (0.0, None)
    gscale = {}
    for k in sorted(params):
        g_tf = tf_grads[k]
        g_us = np.asarray(our_grads[k], np.float64)
        noise = max(tf_noise[k], our_noise[k])
        scale = gscale[k] = float(np.max(np.abs(g_tf)))
        if scale < max(1e-6, 5.0 * noise):
            # mathematically-zero gradient (bias before BN) or a tensor
            # whose TF gradient is itself noise-dominated — assert ours is
            # equally noise-small
            n_zero += 1
            check(
                f"grad[{k}] (noise-dominated)", g_us, 0.0 * g_us,
                max(2e-6, 10.0 * noise),
            )
            continue
        # atol: relative bound + grads.h5 f32-recovery error + 10x the
        # architecture's OWN measured noise at this tensor.  The relative
        # term is 1e-3: the permuted-batch self-spread is a WEAK
        # perturbation (same kernels, reordered reductions) while the
        # cross-framework comparison is a strong one (different conv
        # algorithms end-to-end) — measured tails reach ~7e-4 relative on
        # tensors with a SHORT backward but a LONG noisy forward (head-side
        # BN gammas: grad = sum(dy * x_hat), and x_hat carries ~1e-4
        # accumulated train-mode forward noise by layer ~100).  Semantic
        # bugs measure orders above: the 2-D Bessel bug this probe caught
        # showed up at 0.3-5 RELATIVE in the state checks, and the step-1
        # params/state assertions below independently bound any systematic
        # error at the 2e-5-absolute level.
        w_mag = float(np.max(np.abs(np.asarray(params[k]))))
        atol = 1e-3 * scale + 1e-7 * w_mag + 2e-7 + 10.0 * noise
        diff = float(np.max(np.abs(g_us - g_tf)))
        rel = diff / max(scale, 1e-12)
        if rel > worst[0]:
            worst = (rel, k)
        if diff > atol:
            # max-element bound exceeded: distinguish "a few elements near
            # the noise floor" from "the tensor disagrees".  A systematic
            # layer bug moves the whole tensor (L2 rel ~ O(1)); accumulated
            # noise concentrated in outlier elements leaves L2 rel tiny.
            l2_rel = float(
                np.linalg.norm(g_us - g_tf) / max(np.linalg.norm(g_tf), 1e-30)
            )
            if l2_rel <= 1e-3:
                print(
                    f"PASS {name} grad[{k}]: max|diff|={diff:.3e} above "
                    f"elementwise atol but L2 rel={l2_rel:.2e} (outlier "
                    f"elements, not tensor-level divergence)"
                )
            else:
                check(f"grad[{k}] (L2 rel {l2_rel:.2e})", g_us, g_tf, atol)
    print(
        f"{name}: {len(params)} grad tensors ({n_zero} noise-dominated); "
        f"worst rel diff {worst[0]:.2e} at {worst[1]}"
    )

    # -- 4-step trajectory --------------------------------------------------
    tx = keras_adam(
        warmup_cosine(
            LR_BASE, N_STEPS,
            warmup_learning_rate=WARMUP_LR, warmup_steps=WARMUP_STEPS,
        )
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, s, o, x, y):
        def lf(p):
            pred, ns = M.apply(
                model_fn, p, s, x, train=True, rng=jax.random.key(1)
            )
            return edge_focal_loss(y, pred), ns

        (l, ns), grads = jax.value_and_grad(lf, has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), ns, o, l

    our_losses = []
    ours_step1 = None
    for step in range(N_STEPS):
        params, state, opt_state, l = train_step(
            params, state, opt_state, jnp.asarray(xs[step]), jnp.asarray(ys[step])
        )
        our_losses.append(float(l))
        if step == 0:
            ours_step1 = (
                {k: np.asarray(v, np.float64) for k, v in params.items()},
                {k: np.asarray(v, np.float64) for k, v in state.items()},
            )
    # loss-trajectory tolerance: TF's own permuted-run loss spread, with
    # margin (semantic divergence compounds per step; noise wobbles)
    tf_loss_spread = max(
        abs(a - b)
        for a, b in zip(tf_res["losses"], tf_res["losses_perm"])
    )
    loss_tol = max(1.5e-4, 10.0 * tf_loss_spread)
    for i, (a, b) in enumerate(zip(our_losses, tf_res["losses"])):
        check(f"loss step{i}", a, b, 2e-6 if i == 0 else loss_tol)

    # -- post-step-1 exact comparison (no chaos: identical pre-step weights)
    # step 0 runs at the warmup lr (1e-5); even a fully noise-directed
    # update moves a weight by <= ~lr, so 3e-5 bounds params with margin
    # while any semantic bug (wrong lr indexing, wrong epsilon, wrong BN
    # update) shows up at 10-100x that.  Moving stats after one step are
    # EMA(0.01) of batch stats computed at IDENTICAL weights: float noise.
    p1_params, p1_state, _ = import_h5_weights(
        os.path.join(work, "post1.h5"), params0, state0
    )
    worst1 = (0.0, None)
    for k in sorted(p1_params):
        d = float(np.max(np.abs(
            ours_step1[0][k] - np.asarray(p1_params[k], np.float64)
        )))
        if d > worst1[0]:
            worst1 = (d, k)
        if d > 3e-5:
            check(f"step1 param [{k}]", ours_step1[0][k],
                  np.asarray(p1_params[k], np.float64), 3e-5)
    print(f"{name}: step-1 params worst |diff| {worst1[0]:.2e} at {worst1[1]}")
    worst1s = (0.0, None)
    for k in sorted(p1_state):
        s_tf1 = np.asarray(p1_state[k], np.float64)
        scale = float(np.max(np.abs(s_tf1)))
        d = float(np.max(np.abs(ours_step1[1][k] - s_tf1)))
        if d / max(scale, 1e-12) > worst1s[0]:
            worst1s = (d / max(scale, 1e-12), k)
        atol = 1e-4 * scale + 1e-5
        if d > atol:
            check(f"step1 state [{k}]", ours_step1[1][k], s_tf1, atol)
    print(
        f"{name}: step-1 BN stats worst rel diff {worst1s[0]:.2e} "
        f"at {worst1s[1]}"
    )

    post_params, post_state, _ = import_h5_weights(
        os.path.join(work, "post.h5"), params0, state0
    )
    postp_params, postp_state, _ = import_h5_weights(
        os.path.join(work, "post_perm.h5"), params0, state0
    )
    drift = N_STEPS * LR_BASE * 1.5  # noise-dominated Adam random-walk bound
    for k in sorted(params):
        w_tf = np.asarray(post_params[k], np.float64)
        w_us = np.asarray(params[k], np.float64)
        wscale = float(np.max(np.abs(w_tf)))
        # TF's own 4-step elementwise spread on the permuted (identical)
        # batches: Adam + the deep backward amplify per-step reduction
        # noise chaotically, and that — not a fixed constant — is the
        # honest scale for cross-framework trajectory diffs
        traj_noise = float(
            np.max(np.abs(w_tf - np.asarray(postp_params[k], np.float64)))
        )
        if gscale[k] < max(1e-6, 5.0 * max(tf_noise[k], our_noise[k])):
            atol = max(drift, 10.0 * traj_noise)
            check(
                f"adam x{N_STEPS} [{k}] (noise-dominated drift)",
                w_us, w_tf, atol,
            )
        else:
            atol = 1e-4 * wscale + 5e-5 + 10.0 * traj_noise
            check(f"adam x{N_STEPS} [{k}]", w_us, w_tf, atol)
    for k in sorted(state):
        s_tf = np.asarray(post_state[k], np.float64)
        s_us = np.asarray(state[k], np.float64)
        scale = float(np.max(np.abs(s_tf)))
        traj_noise = float(
            np.max(np.abs(s_tf - np.asarray(postp_state[k], np.float64)))
        )
        # 4-step moving stats are a chaos-AMPLIFIED observable: they track
        # batch statistics of activations behind noise-dominated weights
        # (res34's SE attention: 4-sample variances of FC outputs), and the
        # TF self-spread under the WEAK permutation perturbation
        # underestimates the strong cross-framework perturbation by the
        # per-step noise ratio.  The sharp assertion is the step-1 state
        # check above (identical pre-step weights, no compounding); here a
        # 5%-relative chaos allowance only guards gross divergence.
        atol = 5e-2 * scale + 2e-5 + 10.0 * traj_noise
        if k.endswith("moving_mean"):
            # tracks mean(conv_out) which includes the noise-driven bias
            # walk: EMA-integrated drift bound (see tf_train_parity_probe)
            atol += (1.0 - BN_MOMENTUM ** N_STEPS) * (2 * N_STEPS * LR_BASE) \
                + (1.0 - BN_MOMENTUM) * LR_BASE * N_STEPS * (N_STEPS - 1)
        check(f"BN x{N_STEPS} [{k}]", s_us, s_tf, atol)
    return failures


def run_model(name: str) -> list:
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tempfile.mkdtemp(prefix=f"bdt_gradpar_{name}_")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--tf-leg", name, work],
        cwd=repo,
    )
    if r.returncode != 0:
        return [f"{name}: tf leg rc={r.returncode}"]
    failures = ours_leg(name, work)
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return failures


def main() -> int:
    if "--tf-leg" in sys.argv:
        i = sys.argv.index("--tf-leg")
        return tf_leg(sys.argv[i + 1], sys.argv[i + 2])
    names = sys.argv[1:] or ["scse", "res34", "hrnet", "v3plus", "bam"]
    all_failures = []
    for name in names:
        all_failures += run_model(name)
        print(flush=True)
    if all_failures:
        print(f"MODEL GRAD PARITY: FAIL ({len(all_failures)}): {all_failures}")
        return 1
    print(f"MODEL GRAD PARITY: PASS ({len(names)} models: {names})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
