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


class TestSceneGrouping:
    def test_grouped_matches_per_scene(self):
        """Same-shape scenes grouped into one dispatch == per-scene results."""
        members = make_members()
        rng = np.random.RandomState(7)
        scenes = [rng.randint(0, 256, (56, 80, 3), np.uint8) for _ in range(5)]
        # 56x80 -> 2x3=6 tiles/scene (tile 32, stride 24); budget 20 -> S=3
        grouped = FusedEnsemblePredictor(
            members, CFG, batch_tiles=20, compute_dtype=jnp.float32
        )
        assert grouped._group_size(6) == 3  # groups of 3+2 scenes
        single = FusedEnsemblePredictor(
            members, CFG, batch_tiles=6, compute_dtype=jnp.float32
        )
        got = grouped.predict_masks_many(scenes)
        for scene, g in zip(scenes, got):
            ref = single.predict_masks(scene)
            for k in ref:
                np.testing.assert_array_equal(g[k], ref[k])

    def test_grouping_mixed_shapes_preserves_order(self):
        """Different-shape scenes interleaved: results return in input order."""
        members = make_members()
        rng = np.random.RandomState(8)
        shapes = [(56, 80), (40, 40), (56, 80), (40, 40), (56, 80)]
        scenes = [rng.randint(0, 256, (h, w, 3), np.uint8) for h, w in shapes]
        fused = FusedEnsemblePredictor(
            members, CFG, batch_tiles=24, compute_dtype=jnp.float32
        )
        got = fused.predict_masks_many(scenes)
        for scene, g in zip(scenes, got):
            assert g["a"].shape == scene.shape[:2]
            ref = fused.predict_masks(scene)
            for k in ref:
                np.testing.assert_array_equal(g[k], ref[k])

    def test_grouped_bucketed(self):
        """Grouping composes with bucketed program shapes (runtime h/w)."""
        members = make_members()
        cfg = TilerConfig(tile=32, stride=24, overlap=8, bucket_sizes=True)
        rng = np.random.RandomState(9)
        # same bucket, different real extents -> one group, runtime hw
        scenes = [
            rng.randint(0, 256, (56, 80, 3), np.uint8),
            rng.randint(0, 256, (50, 70, 3), np.uint8),
        ]
        fused = FusedEnsemblePredictor(
            members, cfg, batch_tiles=64, compute_dtype=jnp.float32
        )
        got = fused.predict_masks_many(scenes)
        single = FusedEnsemblePredictor(
            members, cfg, batch_tiles=6, compute_dtype=jnp.float32
        )
        for scene, g in zip(scenes, got):
            ref = single.predict_masks(scene)
            for k in ref:
                np.testing.assert_array_equal(g[k], ref[k])

    def test_bucketed_scenes_with_different_real_grids_not_merged(self):
        """Regression: 100x80 (4x3 real tiles) and 76x80 (3x3) both bucket to
        a 4x4/104x104 program, but their real origin grids differ — grouping
        them under one origin array silently never dispatched the extra
        tile-row (rows 72-99 came back zero).  The group key must include the
        real origins, so these scenes land in separate dispatches with
        correct (single-scene-equal) masks."""
        members = make_members()
        cfg = TilerConfig(tile=32, stride=24, overlap=8, bucket_sizes=True)
        rng = np.random.RandomState(17)
        scenes = [
            rng.randint(0, 256, (100, 80, 3), np.uint8),
            rng.randint(0, 256, (76, 80, 3), np.uint8),
        ]
        fused = FusedEnsemblePredictor(
            members, cfg, batch_tiles=64, compute_dtype=jnp.float32
        )
        got = fused.predict_masks_many(scenes)
        single = FusedEnsemblePredictor(
            members, cfg, batch_tiles=6, compute_dtype=jnp.float32
        )
        for scene, g in zip(scenes, got):
            ref = single.predict_masks(scene)
            for k in ref:
                np.testing.assert_array_equal(g[k], ref[k])


class TestBitplanePacking:
    def test_roundtrip(self):
        from building_detection_tpu.infer.fused_ensemble import (
            _pack_bitplanes,
            _unpack_bitplanes,
        )

        rng = np.random.RandomState(3)
        # widths around the byte boundary, 5 bits used per pixel
        for w in (8, 13, 16, 21):
            canvas = rng.randint(0, 32, (2, 5, w), np.uint8)
            planes = np.asarray(_pack_bitplanes(jnp.asarray(canvas), 5))
            assert planes.shape == (5, 2, 5, -(-w // 8))
            bits = _unpack_bitplanes(planes, w)
            for b in range(5):
                np.testing.assert_array_equal(bits[b], (canvas >> b) & 1)


class TestMasksIter:
    def test_iter_covers_all_indices_any_order(self):
        members = make_members()
        rng = np.random.RandomState(11)
        scenes = [
            rng.randint(0, 256, (56, 80, 3), np.uint8),
            np.zeros((4, 4, 3), np.uint8),  # degenerate
            rng.randint(0, 256, (40, 40, 3), np.uint8),
            rng.randint(0, 256, (56, 80, 3), np.uint8),
        ]
        fused = FusedEnsemblePredictor(
            members, CFG, batch_tiles=12, compute_dtype=jnp.float32
        )
        seen = {}
        for idx, masks in fused.predict_masks_iter(scenes):
            seen[idx] = masks
        assert sorted(seen) == [0, 1, 2, 3]
        many = fused.predict_masks_many(scenes)
        for i in range(4):
            for k in many[i]:
                np.testing.assert_array_equal(seen[i][k], many[i][k])


class TestGroupSizeQuantization:
    def test_split_group_sizes_bounded(self):
        members = make_members()
        fused = FusedEnsemblePredictor(
            members, CFG, batch_tiles=128, compute_dtype=jnp.float32
        )
        allowed = set(fused._GROUP_SIZES)
        for count in range(1, 40):
            for cap in (1, 2, 3, 5, 8, 21):
                parts = fused._split_group(count, cap)
                assert sum(parts) == count
                assert all(p in allowed and p <= cap for p in parts)
        # the 2048^2 bench shape: 10 scenes at cap 3 -> 3+3+3+1 (unchanged)
        assert fused._split_group(10, 3) == [3, 3, 3, 1]
        # serving shape: 8 queued small scenes fit one group
        assert fused._split_group(8, 21) == [8]


class TestInFlightWindow:
    def test_small_window_matches_unbounded(self):
        members = make_members()
        rng = np.random.RandomState(13)
        scenes = [
            rng.randint(0, 256, (56, 80, 3), np.uint8) for _ in range(5)
        ] + [np.zeros((4, 4, 3), np.uint8)]
        fused = FusedEnsemblePredictor(
            members, CFG, batch_tiles=12, compute_dtype=jnp.float32
        )
        ref = fused.predict_masks_many(scenes, max_in_flight=64)
        for window in (1, 2):
            got = fused.predict_masks_many(scenes, max_in_flight=window)
            for r, g in zip(ref, got):
                for k in r:
                    np.testing.assert_array_equal(g[k], r[k])
