"""Full-loop migration demo: train HERE, deploy into the reference TF stack.

The migration story's last leg, end to end with REAL learned weights (the
oracle tests prove bit-identical weight interchange at random init;
this proves checkpoints TRAINED on the TPU stack keep their task quality
after deployment into the unmodified reference code), for ALL FIVE zoo
members (`/root/reference/predict.py:17-54` loads all five .h5 files):

1. train each model on synthetic bright-rectangle imagery with the
   production recipe (staged-HBM epochs, edge focal loss, keras_adam +
   warmup-cosine) for its learn_smoke step budget;
2. save the npz checkpoint and convert it with the REAL ``bdt-convert`` CLI
   (canonical Keras layer order + keras_version attr);
3. evaluate OURSELVES on held-out 600x600 scenes with a literal re-enactment
   of the reference tiler in OUR stack (same accumulate->binarize math);
4. in a fresh TF subprocess: build the UNMODIFIED reference model, have real
   tf_keras ``model.load_weights`` consume our file, re-enact the reference
   tiler (`predict.py:90-116`) on the SAME scenes and score IoU — assert the
   deployed IoU matches our own eval (|diff| <= 0.02), i.e. the checkpoint
   lost nothing in translation.  This is the class of check that caught the
   round-3 weight-rank-ordering exporter bug random-init round-trips missed.

Run: ``python scripts/train_deploy_demo.py [model ...]`` (default: all five;
trains on the default backend, the real chip under axon; pass ``--cpu`` for
a reduced CPU-only run of scse).  ``--tf-eval <dir> <model>`` is the
internal TF-subprocess entry.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

ALL_MODELS = ["res34", "scse", "hrnet", "v3plus", "bam"]

# (train steps, train hw, lr) — the learn_smoke budgets; training happens at
# 128 px (HBM-friendly, converges) and deployment evals at the 512-tile
# geometry the reference tiler uses (all models are fully convolutional;
# v3plus/bam image-pooling generalizes, matching the reference's global-pool
# intent at 512 where pool_size=32 == the whole 32x32 feature map)
RECIPES = {
    "res34": (300, 128, 5e-4),
    "scse": (300, 128, 5e-4),
    "hrnet": (300, 128, 5e-4),
    "v3plus": (150, 128, 5e-4),
    "bam": (150, 128, 5e-4),
}


def make_dataset(rng, n, hw):
    """Bright rectangles on dark noise (same task as learn_smoke)."""
    imgs = rng.randint(0, 60, (n, hw, hw, 3)).astype(np.uint8)
    labs = np.zeros((n, hw, hw), np.uint8)
    for i in range(n):
        for _ in range(rng.randint(2, 5)):
            x, y = rng.randint(0, hw - 40, 2)
            w, h = rng.randint(12, 40, 2)
            imgs[i, y : y + h, x : x + w] = rng.randint(150, 255, 3)
            labs[i, y : y + h, x : x + w] = 255
    return imgs, labs


def reference_tiler_masks(predict_tile, scenes):
    """Literal re-enactment of the reference tiler `predict.py:90-116` around
    any (1,512,512,3)->(512,512,2) predict callable."""
    import math

    out = []
    for scene in scenes:
        norm = (scene / 127.5 - 1.0).astype(np.float32)
        h, w = norm.shape[:2]
        new_h = math.ceil((h - 152) / 360) * 360 + 152
        new_w = math.ceil((w - 152) / 360) * 360 + 152
        canvas = np.zeros((max(new_h, 512), max(new_w, 512), 3), np.float32)
        acc = np.zeros((max(new_h, 512), max(new_w, 512)), np.int8)
        canvas[:h, :w] = norm
        for i in range(0, new_h - 152, 360):
            for j in range(0, new_w - 152, 360):
                tile = canvas[i : i + 512, j : j + 512][None]
                pred = predict_tile(tile)
                acc[i : i + 512, j : j + 512] += pred.argmax(-1).astype(np.int8)
        out.append((acc >= 1)[:h, :w])
    return out


def iou_of(mask, label) -> float:
    truth = label > 0
    inter = float((mask & truth).sum())
    union = float((mask | truth).sum())
    return inter / union if union else 1.0


def tf_eval(work_dir: str, name: str) -> int:
    """TF-subprocess leg: the unmodified reference stack consumes our .h5."""
    from tests import tf_oracle  # sets TF_USE_LEGACY_KERAS before TF import

    model = tf_oracle.build_reference_model(name)
    model.load_weights(os.path.join(work_dir, f"{name}.h5"))  # OUR export

    data = np.load(os.path.join(work_dir, "eval_scenes.npz"))
    scenes, labels = data["scenes"], data["labels"]
    masks = reference_tiler_masks(
        lambda tile: model.predict(tile, verbose=0)[0], scenes
    )
    results = {}
    for idx, (mask, label) in enumerate(zip(masks, labels)):
        results[f"scene{idx}"] = iou_of(mask, label)
        print(f"[tf-eval {name}] scene {idx}: deployed IoU="
              f"{results[f'scene{idx}']:.4f}", flush=True)
    with open(os.path.join(work_dir, f"tf_eval_{name}.json"), "w") as f:
        json.dump(results, f)
    return 0


def run_one(name: str, cpu: bool, work: str, scenes, labels) -> dict:
    import jax
    import jax.numpy as jnp

    from building_detection_tpu.core import module as M
    from building_detection_tpu.core.config import TrainConfig
    from building_detection_tpu.models.registry import MODEL_REGISTRY
    from building_detection_tpu.train.trainer import Trainer

    steps, hw, lr = RECIPES[name]
    batch = 8
    if cpu:
        steps, hw, batch = 60, 96, 4
    cfg = TrainConfig(
        batch_size=batch, epochs=1, warmup_epochs=0, image_size=hw, lr_base=lr
    )
    tr = Trainer(name, cfg, steps_per_epoch=steps,
                 compute_dtype=jnp.float32 if cpu else jnp.bfloat16)
    rng = np.random.RandomState(0)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(50, steps - done)
        imgs, labs = make_dataset(rng, k * batch, hw)
        m = tr.train_epoch_staged(*tr.stage_dataset(imgs, labs))
        done += k
        print(f"  {name} step {done:3d} loss={float(m['loss'][-1]):.4f} "
              f"IoU={float(m['IoU'][-1]):.3f}", flush=True)
    ev = tr.eval_on_batch(*make_dataset(np.random.RandomState(999), batch, hw))
    print(f"{name}: trained, held-out IoU={ev['IoU']:.3f} "
          f"({steps} steps, {time.time() - t0:.0f}s)", flush=True)

    npz = os.path.join(work, f"{name}.npz")
    tr.save(npz)

    # the REAL CLI converts the trained checkpoint (canonical Keras order)
    r = subprocess.run(
        [sys.executable, "-m", "building_detection_tpu.cli.convert",
         name, npz, os.path.join(work, f"{name}.h5")],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, f"bdt-convert failed for {name}"

    # OUR eval of the SAME scenes through the SAME tiler math, f32 (the TF
    # leg runs f32; this isolates deployment loss from dtype noise)
    fwd = jax.jit(lambda p, s, x: M.apply(
        MODEL_REGISTRY[name], p, s, x, compute_dtype=jnp.float32)[0])
    params, state = tr.params, tr.state

    def predict_tile(tile):
        return np.asarray(fwd(params, state, jnp.asarray(tile)))[0]

    masks = reference_tiler_masks(predict_tile, scenes)
    ours = {f"scene{i}": iou_of(m, l)
            for i, (m, l) in enumerate(zip(masks, labels))}
    print(f"{name}: our-stack eval IoU: "
          f"{', '.join(f'{v:.4f}' for v in ours.values())}", flush=True)
    return {"held_out_train_iou": float(ev["IoU"]), "ours": ours}


def main() -> int:
    if "--tf-eval" in sys.argv:
        i = sys.argv.index("--tf-eval")
        return tf_eval(sys.argv[i + 1], sys.argv[i + 2])

    cpu = "--cpu" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or (
        ["scse"] if cpu else ALL_MODELS
    )
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()  # the train-step scan is minutes to compile cold

    work = tempfile.mkdtemp(prefix="bdt_deploy_")
    # held-out 600x600 scenes -> the reference tiler actually tiles (2x2)
    ev_rng = np.random.RandomState(4242)
    scenes, labels = make_dataset(ev_rng, 2, 600)
    np.savez(os.path.join(work, "eval_scenes.npz"), scenes=scenes, labels=labels)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    summary = {}
    failed = []
    for name in names:
        res = run_one(name, cpu, work, scenes, labels)
        print(f"[deploy {name}] handing the checkpoint to the unmodified "
              "reference stack", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tf-eval", work, name],
            cwd=repo,
        )
        if r.returncode != 0:
            failed.append(name)
            summary[name] = {**res, "deployed": None, "status": "TF-EVAL-ERROR"}
            continue
        with open(os.path.join(work, f"tf_eval_{name}.json")) as f:
            deployed = json.load(f)
        diffs = {k: abs(deployed[k] - res["ours"][k]) for k in deployed}
        ok = all(d <= 0.02 for d in diffs.values()) and all(
            v > 0.5 for v in deployed.values()
        )
        if not ok:
            failed.append(name)
        summary[name] = {
            **res, "deployed": deployed, "max_diff": max(diffs.values()),
            "status": "PASS" if ok else "FAIL",
        }
        print(f"{name}: deployed IoU "
              f"{', '.join(f'{v:.4f}' for v in deployed.values())} "
              f"(max |ours-deployed| {max(diffs.values()):.4f}) "
              f"-> {summary[name]['status']}", flush=True)

    with open(os.path.join(work, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[artifacts] {work}/summary.json")
    for name in names:
        s = summary[name]
        dep = (", ".join(f"{v:.3f}" for v in s["deployed"].values())
               if s["deployed"] else "n/a")
        print(f"  {name:6s} trainIoU={s['held_out_train_iou']:.3f} "
              f"deployedIoU=[{dep}] {s['status']}")
    print(f"TRAIN->DEPLOY {len(names) - len(failed)}/{len(names)}: "
          f"{'PASS' if not failed else 'FAIL ' + ','.join(failed)}")
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
