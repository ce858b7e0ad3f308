"""Fused one-program ensemble == per-model EnsemblePredictor, bit for bit."""
import jax
import jax.numpy as jnp
import numpy as np

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import TilerConfig
from building_detection_tpu.infer.engine import EnsemblePredictor
from building_detection_tpu.infer.fused_ensemble import FusedEnsemblePredictor
from building_detection_tpu.nn import layers as L

CFG = TilerConfig(tile=32, stride=24, overlap=8)


def model_a(s, x):
    x = L.conv2d(s, x, 8, 3, strides=2, activation="relu")
    x = L.conv2d_transpose(s, x, 8, 2, strides=2, activation="relu")
    return L.conv2d(s, x, 2, 3, activation="softmax")


def model_b(s, x):
    x = L.conv2d(s, x, 4, 3, activation="relu")
    return L.conv2d(s, x, 2, 1, activation="softmax")


def make_members():
    members = {}
    for i, (name, fn) in enumerate(
        [("a", model_a), ("b", model_b), ("c", model_a), ("d", model_b), ("e", model_a)]
    ):
        params, state = M.init(
            fn, jax.random.key(i), jnp.zeros((1, 32, 32, 3))
        )
        members[name] = (fn, params, state)
    return members


class TestFusedEnsemble:
    def test_matches_per_model_predictor(self):
        members = make_members()
        img = np.random.RandomState(0).randint(0, 256, (56, 80, 3), np.uint8)
        per_model = EnsemblePredictor(members, CFG, batch_tiles=3, compute_dtype=jnp.float32)
        fused = FusedEnsemblePredictor(members, CFG, batch_tiles=3, compute_dtype=jnp.float32)
        ref = per_model.predict_masks(img)
        got = fused.predict_masks(img)
        assert set(ref) == set(got)
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k])

    def test_vote_fast_path(self):
        members = make_members()
        img = np.random.RandomState(1).randint(0, 256, (40, 40, 3), np.uint8)
        fused = FusedEnsemblePredictor(members, CFG, batch_tiles=2, compute_dtype=jnp.float32)
        masks = fused.predict_masks(img)
        vote = fused.predict_vote(img)
        expected = np.where(
            sum((m // 255).astype(np.int32) for m in masks.values()) >= 3, 255, 0
        ).astype(np.uint8)
        np.testing.assert_array_equal(vote, expected)

    def test_degenerate_scene(self):
        members = make_members()
        fused = FusedEnsemblePredictor(members, CFG, batch_tiles=2, compute_dtype=jnp.float32)
        out = fused.predict_masks(np.zeros((4, 4, 3), np.uint8))
        for m in out.values():
            np.testing.assert_array_equal(m, np.zeros((4, 4), np.uint8))


class TestPipelinedBatch:
    def test_many_matches_single_calls(self):
        members = make_members()
        fused = FusedEnsemblePredictor(members, CFG, batch_tiles=3, compute_dtype=jnp.float32)
        rng = np.random.RandomState(5)
        scenes = [
            rng.randint(0, 256, (56, 80, 3), np.uint8),
            rng.randint(0, 256, (40, 40, 3), np.uint8),
            np.zeros((4, 4, 3), np.uint8),  # degenerate
        ]
        many = fused.predict_masks_many(scenes)
        for scene, got in zip(scenes, many):
            ref = fused.predict_masks(scene)
            assert set(got) == set(ref)
            for k in ref:
                np.testing.assert_array_equal(got[k], ref[k])
