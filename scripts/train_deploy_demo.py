"""Full-loop migration demo: train HERE, deploy into the reference TF stack.

The migration story's last leg, end to end with REAL learned weights (the
oracle tests prove bit-identical weight interchange at random init;
this proves a checkpoint TRAINED on the TPU stack keeps its task quality
after deployment into the unmodified reference code):

1. train scse (the reference UNet, `predict_model/scse.py:49`) on synthetic
   bright-rectangle imagery with the production recipe (staged-HBM epochs,
   edge focal loss, keras_adam + warmup-cosine) until held-out IoU > 0.9;
2. save the npz checkpoint and convert it with the REAL ``bdt-convert`` CLI
   (canonical Keras layer order + keras_version attr);
3. in a fresh TF subprocess: build the UNMODIFIED reference UNet, have real
   tf_keras ``model.load_weights`` consume our file, re-enact the reference
   tiler (`predict.py:90-116`) on held-out 600x600 scenes (4 tiles each) and
   score IoU against ground truth — assert > 0.9.

Run: ``python scripts/train_deploy_demo.py`` (trains on the default backend,
the real chip under axon; pass ``--cpu`` for a reduced CPU-only run).
The ``--tf-eval <dir>`` mode is the internal TF-subprocess entry.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


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


def tf_eval(work_dir: str) -> int:
    """TF-subprocess leg: the unmodified reference stack consumes our .h5."""
    from tests import tf_oracle  # sets TF_USE_LEGACY_KERAS before TF import

    import math

    model = tf_oracle.build_reference_model("scse")
    model.load_weights(os.path.join(work_dir, "scse.h5"))  # OUR exported file

    data = np.load(os.path.join(work_dir, "eval_scenes.npz"))
    scenes, labels = data["scenes"], data["labels"]
    results = {}
    for idx, (scene, label) in enumerate(zip(scenes, labels)):
        # literal re-enactment of the reference tiler `predict.py:90-116`
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
                pred = model.predict(tile, verbose=0)[0]
                acc[i : i + 512, j : j + 512] += pred.argmax(-1).astype(np.int8)
        mask = (acc >= 1)[:h, :w]
        truth = label > 0
        inter = float((mask & truth).sum())
        union = float((mask | truth).sum())
        iou = inter / union if union else 1.0
        results[f"scene{idx}"] = iou
        print(f"[tf-eval] scene {idx} {scene.shape[:2]}: deployed IoU={iou:.4f}",
              flush=True)
    with open(os.path.join(work_dir, "tf_eval.json"), "w") as f:
        json.dump(results, f)
    return 0 if all(v > 0.9 for v in results.values()) else 1


def main() -> int:
    if "--tf-eval" in sys.argv:
        return tf_eval(sys.argv[sys.argv.index("--tf-eval") + 1])

    cpu = "--cpu" in sys.argv
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()  # the train-step scan is minutes to compile cold
    import jax.numpy as jnp

    from building_detection_tpu.core.config import TrainConfig
    from building_detection_tpu.train.trainer import Trainer

    # reduced budget on CPU: scse learns the toy task in far fewer steps at
    # a smaller tile; the chip run uses the learn_smoke recipe
    steps, hw, batch = (60, 96, 4) if cpu else (300, 128, 8)
    cfg = TrainConfig(
        batch_size=batch, epochs=1, warmup_epochs=0, image_size=hw, lr_base=5e-4
    )
    tr = Trainer("scse", cfg, steps_per_epoch=steps,
                 compute_dtype=jnp.float32 if cpu else jnp.bfloat16)
    rng = np.random.RandomState(0)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(50, steps - done)
        imgs, labs = make_dataset(rng, k * batch, hw)
        m = tr.train_epoch_staged(*tr.stage_dataset(imgs, labs))
        done += k
        print(f"  step {done:3d} loss={float(m['loss'][-1]):.4f} "
              f"IoU={float(m['IoU'][-1]):.3f}", flush=True)
    ev = tr.eval_on_batch(*make_dataset(np.random.RandomState(999), batch, hw))
    print(f"trained here: held-out IoU={ev['IoU']:.3f} "
          f"({steps} steps, {time.time() - t0:.0f}s)", flush=True)
    assert ev["IoU"] > 0.9, "training leg did not converge"

    work = tempfile.mkdtemp(prefix="bdt_deploy_")
    npz = os.path.join(work, "scse.npz")
    tr.save(npz)

    # the REAL CLI converts the trained checkpoint (canonical Keras order)
    r = subprocess.run(
        [sys.executable, "-m", "building_detection_tpu.cli.convert",
         "scse", npz, os.path.join(work, "scse.h5")],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, "bdt-convert failed"

    # held-out 600x600 scenes -> the reference tiler actually tiles (2x2)
    ev_rng = np.random.RandomState(4242)
    scenes, labels = make_dataset(ev_rng, 2, 600)
    np.savez(os.path.join(work, "eval_scenes.npz"), scenes=scenes, labels=labels)

    print("[deploy] handing the checkpoint to the unmodified reference stack",
          flush=True)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--tf-eval", work],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    with open(os.path.join(work, "tf_eval.json")) as f:
        results = json.load(f)
    ok = r.returncode == 0
    print(f"TRAIN->DEPLOY: {'PASS' if ok else 'FAIL'} "
          f"(deployed-TF IoU: {', '.join(f'{v:.3f}' for v in results.values())})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
