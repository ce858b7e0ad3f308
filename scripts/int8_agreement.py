"""Measure mask/vote agreement of the opt-in int8 pointwise mode vs bf16.

The ``int8_pointwise`` flag (docs/ARCHITECTURE.md round 3) trades pixel
parity for MXU throughput on the 1x1 projections.  This script quantifies
the trade on the REAL five-model zoo: per-model mask agreement, fused
3-of-5 vote agreement, and end-to-end corner-point drift, on random
synthetic scenes.  Run on the chip (one process) or CPU (slow):

    python scripts/int8_agreement.py [n_scenes] [scene_hw]

The reference has no analog (no quantized path exists there); this is
framework due-diligence for the opt-in mode only.
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    import jax
    import jax.numpy as jnp

    from building_detection_tpu.core.config import Config
    from building_detection_tpu.infer.pipeline import Pipeline

    rng = np.random.RandomState(0)
    # blobby scenes (smoothed noise) rather than white noise so masks have
    # structure and the vote/polygon stages do real work
    scenes = []
    for _ in range(n_scenes):
        base = rng.rand(hw // 16, hw // 16, 3)
        img = np.kron(base, np.ones((16, 16, 1)))[:hw, :hw]
        scenes.append((img * 255).astype(np.uint8))

    cfg = Config()
    pipes = {}
    for tag, q in (("bf16", False), ("int8", 512)):
        pipes[tag] = Pipeline(
            cfg=cfg,
            compute_dtype=jnp.bfloat16,
            int8_pointwise=q,
            # production int8 path: static scales calibrated on the scenes
            int8_calibration=scenes[:1] if q else None,
            # random weights: both pipelines must share them
            weights=None,
            seed=0,
        )

    per_model: dict = {}
    fused_agree = []
    point_stats = []
    for i, scene in enumerate(scenes):
        r0 = pipes["bf16"].predict_image(scene)
        r1 = pipes["int8"].predict_image(scene)
        masks0 = r0.masks
        masks1 = r1.masks
        for name in masks0:
            a = (np.asarray(masks0[name]) > 0)
            b = (np.asarray(masks1[name]) > 0)
            per_model.setdefault(name, []).append((a == b).mean())
        fused_agree.append(
            ((np.asarray(r0.fused) > 0) == (np.asarray(r1.fused) > 0)).mean()
        )
        n0 = len(r0.corners)
        n1 = len(r1.corners)
        point_stats.append((n0, n1))
        print(
            f"scene {i}: fused agreement {fused_agree[-1]:.6f}, "
            f"polygons {n0} vs {n1}",
            flush=True,
        )

    print("\nper-model mask agreement (mean over scenes):", flush=True)
    for name in sorted(per_model):
        print(f"  {name:8s} {np.mean(per_model[name]):.6f}", flush=True)
    print(f"fused 3-of-5 vote agreement: {np.mean(fused_agree):.6f}", flush=True)
    tot0 = sum(a for a, _ in point_stats)
    tot1 = sum(b for _, b in point_stats)
    print(f"polygon counts: bf16 {tot0}, int8 {tot1}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
