"""Settle the learn_smoke convergence floors as task parity or recipe gap.

`scripts/learn_smoke.py` (round 3) recorded held-out IoU 1.000/1.000 for
res34/scse but 0.857 (hrnet), 0.933 (v3plus), 0.825 (bam) on the synthetic
rectangle task.  Gradient/optimizer-trajectory parity vs real TF is proven
at step granularity (`scripts/tf_train_parity_probe.py`), but that leaves
open whether the REFERENCE harness itself would land at the same IoU on the
same task — "task ceiling" vs "our recipe under-trains".  This script runs
both legs with the SAME data sequence, step budget, LR schedule and loss:

* **ours**: the production Trainer (staged-HBM epochs, on-device edge maps,
  keras_adam + cosine) — run per model at bf16 (the learn_smoke config) and
  f32 (to separate dtype effects from recipe effects);
* **tf**: the UNMODIFIED reference model (`/root/reference/predict_model/`)
  trained under real tf_keras with the reference recipe re-enacted
  literally (oracle-style transcription, like tests/reference_oracle.py):
  cv2 edge-weight bands (`train_model/res34.py:82-104`), edge_focal_loss
  (`res34.py:344-356`), per-batch cosine LR (`res34.py:512-531`), Adam.

Both legs train at 128 px (HBM/CPU-affordable; all models are fully
convolutional).  For v3plus/bam the reference ASPP hard-codes
``AveragePooling2D(pool_size=32)`` + ``UpSampling2D(32)`` — at its native
512 input the 32x32 feature map makes that exactly GLOBAL image pooling
(`v3plus.py:302-304`), so at 128 input (8x8 features) the equivalent global
pooling is pool 8; the TF leg substitutes 32->8, the same generalization our
models make.  Everything else is the reference's own code.

Run: ``python scripts/tf_convergence_floor.py [model ...]`` (default
hrnet v3plus bam — the members with floors < 1.0).  Results land in a table
(also written to /tmp/bdt_floor_study.json) for BASELINE.md.
``--tf-leg <model> <out.json>`` is the internal TF-subprocess entry;
``--tf-only`` / ``--ours-only`` restrict the legs.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# identical to learn_smoke.RECIPES for the studied members
RECIPES = {
    "res34": (300, 128, 5e-4),
    "scse": (300, 128, 5e-4),
    "hrnet": (300, 128, 5e-4),
    "v3plus": (150, 128, 5e-4),
    "bam": (150, 128, 5e-4),
}
BATCH = 8
CHUNK = 50  # learn_smoke generates data in 50-step chunks from ONE stream


def make_dataset(rng, n, hw):
    imgs = rng.randint(0, 60, (n, hw, hw, 3)).astype(np.uint8)
    labs = np.zeros((n, hw, hw), np.uint8)
    for i in range(n):
        for _ in range(rng.randint(2, 5)):
            x, y = rng.randint(0, hw - 40, 2)
            w, h = rng.randint(12, 40, 2)
            imgs[i, y : y + h, x : x + w] = rng.randint(150, 255, 3)
            labs[i, y : y + h, x : x + w] = 255
    return imgs, labs


def iou_from_masks(pred_mask, true_mask) -> float:
    tp = float((pred_mask & true_mask).sum())
    fp = float((pred_mask & ~true_mask).sum())
    fn = float((~pred_mask & true_mask).sum())
    return tp / (tp + fp + fn + 1e-7)


# --------------------------------------------------------------------------
# ours leg
# --------------------------------------------------------------------------
def ours_leg(name: str, dtype_name: str) -> dict:
    import jax.numpy as jnp

    from building_detection_tpu.core.config import TrainConfig
    from building_detection_tpu.train.trainer import Trainer

    steps, hw, lr = RECIPES[name]
    cfg = TrainConfig(
        batch_size=BATCH, epochs=1, warmup_epochs=0, image_size=hw, lr_base=lr
    )
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    tr = Trainer(name, cfg, steps_per_epoch=steps, compute_dtype=dtype)
    rng = np.random.RandomState(0)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(CHUNK, steps - done)
        imgs, labs = make_dataset(rng, k * BATCH, hw)
        m = tr.train_epoch_staged(*tr.stage_dataset(imgs, labs))
        done += k
        print(f"  ours[{dtype_name}] {name} step {done:3d} "
              f"loss={float(m['loss'][-1]):.4f} IoU={float(m['IoU'][-1]):.3f}",
              flush=True)
    ev = tr.eval_on_batch(*make_dataset(np.random.RandomState(999), BATCH, hw))
    out = {"iou": float(ev["IoU"]), "pa": float(ev["PA"]),
           "f1": float(ev["F1_score"]), "secs": round(time.time() - t0, 1)}
    print(f"ours[{dtype_name}] {name}: held-out IoU={out['iou']:.3f} "
          f"({out['secs']:.0f}s)", flush=True)
    return out


# --------------------------------------------------------------------------
# tf leg (subprocess: Keras name counters + TF state are process-global)
# --------------------------------------------------------------------------
def tf_leg(name: str, out_path: str) -> int:
    from tests import tf_oracle  # sets TF_USE_LEGACY_KERAS pre-TF-import

    import cv2 as cv
    import tensorflow as tf
    import tf_keras
    from tf_keras import backend as K

    steps, hw, lr_base = RECIPES[name]
    tf_keras.utils.set_random_seed(0)

    # build the reference model at 128 px; substitute the ASPP global-pool
    # equivalent (pool 32 -> 8, see module docstring) for the Xception pair
    fname, _ = tf_oracle._BUILDERS[name]
    mod = tf_oracle._load_reference_module(fname)
    feat = hw // 16  # reference output stride 16 (`v3plus.py:173-236`)
    orig_ap, orig_up = tf.keras.layers.AveragePooling2D, tf.keras.layers.UpSampling2D

    def AP(pool_size=(2, 2), **kw):
        if pool_size == 32:
            pool_size = feat
        return orig_ap(pool_size=pool_size, **kw)

    def UP(size=(2, 2), **kw):
        if size == 32:
            size = feat
        return orig_up(size=size, **kw)

    tf.keras.layers.AveragePooling2D, tf.keras.layers.UpSampling2D = AP, UP
    try:
        if name == "hrnet":
            model = mod.HRNet(shape=(hw, hw, 3))
        elif name == "v3plus":
            model = mod.Xception_DeepLabV3_Plus(shape=(hw, hw, 3))
        elif name == "bam":
            model = mod.Xception_DeepLabV3_Plus_bam(shape=(hw, hw, 3))
        elif name == "scse":
            model = mod.UNet(2, (hw, hw, 3))
        else:
            raise ValueError(f"tf leg unsupported for {name} (res34 input is "
                             "hard-coded 512; its floor is 1.0 anyway)")
    finally:
        tf.keras.layers.AveragePooling2D = orig_ap
        tf.keras.layers.UpSampling2D = orig_up

    def edge_focal_loss(y_true, y_pred):
        # literal re-enactment of `train_model/res34.py:344-356` (oracle)
        y = y_true[..., :2]
        edge_w = y_true[..., 2:4]
        w = tf.constant([0.35, 0.65], y_pred.dtype)
        loss = (w * edge_w * y * (1 - y_pred) * (1 - y_pred)
                * tf.math.log(y_pred + K.epsilon()))
        return -tf.reduce_mean(tf.reduce_sum(loss, axis=-1))

    def to_targets(labs_u8):
        # one-hot + edge bands, the reference feeder recipe
        # (`train_model/res34.py:76-104`): 3x3 kernel, 5 iterations, weight 2
        n = len(labs_u8)
        out = np.zeros((n, hw, hw, 4), np.float32)
        kernel = np.ones((3, 3), np.uint8)
        for i, lab in enumerate(labs_u8):
            b = (lab > 0).astype(np.uint8)
            erode = cv.erode(b, kernel, iterations=5)
            p_edge = np.where((b - erode) == 1, 2.0, 1.0)
            dilate = cv.dilate(b, kernel, iterations=5)
            f_edge = np.where((dilate - b) == 1, 2.0, 1.0)
            out[i, ..., 0] = 1.0 - b
            out[i, ..., 1] = b
            out[i, ..., 2] = f_edge
            out[i, ..., 3] = p_edge
        return out

    class CosineLR(tf_keras.callbacks.Callback):
        # per-batch cosine (`res34.py:512-585`), warmup 0, global step
        def __init__(self):
            super().__init__()
            self.step = 0

        def on_train_batch_begin(self, batch, logs=None):
            lr = 0.5 * lr_base * (1 + np.cos(np.pi * self.step / float(steps)))
            K.set_value(self.model.optimizer.lr, max(lr, 0.0))
            self.step += 1

    model.compile(
        optimizer=tf_keras.optimizers.Adam(learning_rate=lr_base),
        loss=edge_focal_loss,
    )
    lr_cb = CosineLR()
    rng = np.random.RandomState(0)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(CHUNK, steps - done)
        imgs, labs = make_dataset(rng, k * BATCH, hw)
        x = (imgs / 127.5 - 1.0).astype(np.float32)
        y = to_targets(labs)
        h = model.fit(x, y, batch_size=BATCH, epochs=1, shuffle=False,
                      verbose=0, callbacks=[lr_cb])
        done += k
        print(f"  tf {name} step {done:3d} loss={h.history['loss'][-1]:.4f}",
              flush=True)
    ev_imgs, ev_labs = make_dataset(np.random.RandomState(999), BATCH, hw)
    probs = model.predict((ev_imgs / 127.5 - 1.0).astype(np.float32),
                          batch_size=BATCH, verbose=0)
    pred = probs.argmax(-1) == 1
    true = ev_labs > 0
    out = {
        "iou": iou_from_masks(pred, true),
        "secs": round(time.time() - t0, 1),
        "note": ("ASPP pool 32->%d (global-pool equivalence at 128px)" % feat
                 if name in ("v3plus", "bam") else ""),
    }
    print(f"tf {name}: held-out IoU={out['iou']:.3f} ({out['secs']:.0f}s)",
          flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return 0


# --------------------------------------------------------------------------
def main() -> int:
    if "--tf-leg" in sys.argv:
        i = sys.argv.index("--tf-leg")
        return tf_leg(sys.argv[i + 1], sys.argv[i + 2])

    names = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "hrnet", "v3plus", "bam"
    ]
    do_ours = "--tf-only" not in sys.argv
    do_tf = "--ours-only" not in sys.argv

    if do_ours:
        from building_detection_tpu.core.runtime import enable_compilation_cache

        enable_compilation_cache()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for name in names:
        row = {}
        if do_ours:
            row["ours_bf16"] = ours_leg(name, "bf16")
            row["ours_f32"] = ours_leg(name, "f32")
        if do_tf:
            out_json = f"/tmp/bdt_floor_{name}.json"
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tf-leg",
                 name, out_json],
                cwd=repo,
            )
            if r.returncode == 0 and os.path.exists(out_json):
                with open(out_json) as f:
                    row["tf"] = json.load(f)
            else:
                row["tf"] = {"iou": None, "error": f"rc={r.returncode}"}
        results[name] = row

    with open("/tmp/bdt_floor_study.json", "w") as f:
        json.dump(results, f, indent=1)
    print("\n| model | ours bf16 | ours f32 | reference TF | verdict |")
    print("|---|---|---|---|---|")
    for name, row in results.items():
        o16 = row.get("ours_bf16", {}).get("iou")
        o32 = row.get("ours_f32", {}).get("iou")
        tfv = row.get("tf", {}).get("iou")
        if o16 is not None and tfv is not None:
            verdict = ("task ceiling (TF lands there too)"
                       if tfv <= max(o16, o32 or 0) + 0.05 else "recipe gap")
        else:
            verdict = "partial run"
        fmt = lambda v: f"{v:.3f}" if v is not None else "—"
        print(f"| {name} | {fmt(o16)} | {fmt(o32)} | {fmt(tfv)} | {verdict} |")
    print("[artifacts] /tmp/bdt_floor_study.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
