"""Benchmark: 512x512 tiles/sec/chip for the 5-model ensemble forward path.

Run on the real TPU chip (the default backend in this image).  Prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference-style CPU ensemble: the
same five architectures driven one tile per predict call in float32 on the
host CPU (the reference's execution model, `/root/reference/predict.py:105-113`
— it publishes no numbers of its own, so the baseline is measured,
BASELINE.md).  Re-measure with ``BDT_BENCH_CPU_BASELINE=measure``; otherwise
the constant below (measured on this host, see BASELINE.md) is used.

Env knobs: BDT_BENCH_BATCH (default 8), BDT_BENCH_ITERS (default 10),
BDT_BENCH_MODELS (default all five).
"""
from __future__ import annotations

import json
import os
import sys
import time

# Reference-style CPU ensemble throughput measured on this host (tiles/sec,
# single 512x512 tile through all five models, f32, batch 1): see BASELINE.md.
CPU_BASELINE_TILES_PER_SEC = float(
    os.environ.get("BDT_CPU_BASELINE_TPS", "0.0149")
)


def _build(names, batch, dtype):
    import jax
    import jax.numpy as jnp

    from building_detection_tpu.core import module as M
    from building_detection_tpu.models.registry import MODEL_REGISTRY, init_model

    members = []
    for i, name in enumerate(names):
        fn = MODEL_REGISTRY[name]
        params, state = init_model(name, jax.random.key(i), (1, 512, 512, 3))

        def fwd(params, state, x, fn=fn):
            probs, _ = M.apply(fn, params, state, x, compute_dtype=dtype)
            return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

        members.append((name, jax.jit(fwd), params, state))
    return members


def measure_ensemble(names, batch, iters, dtype) -> float:
    """Ensemble tiles/sec: each tile goes through all five models."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    members = _build(names, batch, dtype)
    x = jax.random.uniform(
        jax.random.key(42), (batch, 512, 512, 3), jnp.float32, -1, 1
    )
    # warmup (compile); NOTE: on the tunneled axon backend block_until_ready
    # does not await execution — a host fetch is the only real sync, so all
    # timing here flushes via np.asarray.
    for _, fwd, params, state in members:
        np.asarray(fwd(params, state, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        for _, fwd, params, state in members:
            out = fwd(params, state, x)
    np.asarray(out)  # device executes FIFO: fetching the last result flushes all
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_cpu_baseline(names) -> float:
    """Reference execution model: one tile per call, f32, CPU."""
    import jax

    cpu = jax.devices("cpu")[0]
    import jax.numpy as jnp

    import numpy as np

    with jax.default_device(cpu):
        members = _build(names, 1, jnp.float32)
        x = jax.random.uniform(jax.random.key(7), (1, 512, 512, 3), jnp.float32, -1, 1)
        for _, fwd, params, state in members:
            np.asarray(fwd(params, state, x))
        t0 = time.perf_counter()
        for _, fwd, params, state in members:
            out = fwd(params, state, x)
        np.asarray(out)
        return 1.0 / (time.perf_counter() - t0)


def measure_scene(names, batch, iters, dtype) -> float:
    """End-to-end fused-ensemble scene throughput: pad + gather + 5 forwards
    + argmax + scatter-OR, one program, on a 2048x2048 scene (36 tiles)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from building_detection_tpu.infer.fused_ensemble import FusedEnsemblePredictor
    from building_detection_tpu.models.registry import MODEL_REGISTRY, init_model

    members = {}
    for i, name in enumerate(names):
        params, state = init_model(name, jax.random.key(i), (1, 512, 512, 3))
        members[name] = (MODEL_REGISTRY[name], params, state)
    pred = FusedEnsemblePredictor(
        members, batch_tiles=batch, compute_dtype=dtype
    )
    rng = np.random.RandomState(0)
    scenes = [
        rng.randint(0, 256, (2048, 2048, 3), np.uint8) for _ in range(iters)
    ]
    pred.predict_masks(scenes[0])  # compile
    n_tiles = 36  # ceil((2048-152)/360)^2 = 6x6
    t0 = time.perf_counter()
    # pipelined: scene uploads/downloads overlap compute via the FIFO queue
    pred.predict_masks_many(scenes)
    dt = time.perf_counter() - t0
    return n_tiles * iters / dt


def measure_train(model_name: str, batch: int, iters: int) -> float:
    """Training images/sec for one model (DP over all local devices):
    the full jitted step incl. on-device edge-weight maps, fwd+bwd, adam."""
    import jax.numpy as jnp
    import numpy as np

    from building_detection_tpu.core.config import TrainConfig
    from building_detection_tpu.train.trainer import Trainer

    cfg = TrainConfig(batch_size=batch)
    trainer = Trainer(
        model_name, cfg, steps_per_epoch=100, compute_dtype=jnp.bfloat16
    )
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (batch, 512, 512, 3), np.uint8)
    labs = np.where(rng.rand(batch, 512, 512) < 0.3, 255, 0).astype(np.uint8)
    trainer.train_on_batch(imgs, labs)  # compile (train_on_batch fetches)
    t0 = time.perf_counter()
    for _ in range(iters):
        trainer.train_on_batch(imgs, labs)  # metrics fetch = real sync
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main() -> int:
    import jax
    import jax.numpy as jnp

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    names = os.environ.get(
        "BDT_BENCH_MODELS", "res34,hrnet,v3plus,scse,bam"
    ).split(",")
    batch = int(os.environ.get("BDT_BENCH_BATCH", "36"))
    iters = int(os.environ.get("BDT_BENCH_ITERS", "10"))
    mode = os.environ.get("BDT_BENCH_MODE", "scene")

    baseline = CPU_BASELINE_TILES_PER_SEC
    if os.environ.get("BDT_BENCH_CPU_BASELINE") == "measure":
        baseline = measure_cpu_baseline(names)
        print(f"# measured CPU baseline: {baseline:.4f} tiles/s", file=sys.stderr)

    unit = "tiles/s"
    if mode == "scene":
        tps = measure_scene(names, batch, iters, jnp.bfloat16)
        metric = "ensemble_scene_512_tiles_per_sec_per_chip"
    elif mode == "train":
        tps = measure_train(names[0], batch, iters)
        metric = f"train_{names[0]}_512_images_per_sec"
        baseline = None
        unit = "images/s"
    else:
        tps = measure_ensemble(names, batch, iters, jnp.bfloat16)
        metric = "ensemble_512_tiles_per_sec_per_chip"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(tps, 3),
                "unit": unit,
                "vs_baseline": round(tps / baseline, 2) if baseline else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
