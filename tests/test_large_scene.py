"""Blocked large-scene prediction == whole-scene prediction, bit for bit.

`infer/large_scene.py` partitions the tile grid into blocks so device memory
is O(block) instead of O(scene); because tiles are partitioned and the canvas
combine is an OR (`predict.py:113-114`), the stitched result must equal the
unblocked path exactly.  Small tile geometry keeps it CPU-fast.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import Config, TilerConfig
from building_detection_tpu.infer import large_scene as LS
from building_detection_tpu.infer.engine import TiledPredictor
from building_detection_tpu.infer.fused_ensemble import FusedEnsemblePredictor
from building_detection_tpu.nn import layers as L
from building_detection_tpu.ops import tiling as T

CFG = TilerConfig(tile=32, stride=24, overlap=8)


def tiny_model(s, x):
    x = L.conv2d(s, x, 8, 3, strides=2, activation="relu")
    x = L.conv2d_transpose(s, x, 8, 2, strides=2, activation="relu")
    return L.conv2d(s, x, 2, 3, activation="softmax")


def tiny_model2(s, x):
    x = L.conv2d(s, x, 6, 5, activation="relu")
    return L.conv2d(s, x, 2, 1, activation="softmax")


def make_predictor(cfg=CFG):
    x = jax.ShapeDtypeStruct((1, cfg.tile, cfg.tile, 3), jnp.float32)
    params, state = M.init(tiny_model, jax.random.key(0), x)
    return TiledPredictor(
        tiny_model, params, state, cfg, batch_tiles=3,
        compute_dtype=jnp.float32,
    )


class TestPlanBlocks:
    def test_partitions_the_global_grid_exactly(self):
        """Union of block-local origins (shifted) == global origins, no dups."""
        for h, w in [(200, 200), (123, 310), (80, 500), (500, 80)]:
            blocks = LS.plan_blocks(h, w, CFG, max_block_tiles=6)
            plan = T.plan_tiles(h, w, CFG)
            if blocks is None:
                assert plan.num_tiles <= 6
                continue
            seen = []
            for b in blocks:
                local = T.plan_tiles(b.rows, b.cols, CFG)
                for (r, c) in local.origins:
                    seen.append((r + b.r0, c + b.c0))
            assert sorted(seen) == sorted(plan.origins), (h, w)

    def test_small_scene_returns_none(self):
        assert LS.plan_blocks(40, 40, CFG, max_block_tiles=128) is None

    def test_degenerate_returns_none(self):
        # dims <= overlap tile to nothing (`predict.py:105-106`)
        assert LS.plan_blocks(8, 300, CFG, max_block_tiles=1) is None

    def test_bug_mode_rejected(self):
        cfg = TilerConfig(tile=32, stride=24, overlap=8, fix_nonsquare_bug=False)
        with pytest.raises(ValueError):
            LS.plan_blocks(500, 500, cfg, max_block_tiles=4)


class TestBlockedSingleModel:
    def test_bit_equal_to_whole_scene(self):
        pred = make_predictor()
        rng = np.random.RandomState(1)
        for shape in [(150, 150), (123, 210), (40, 300)]:
            img = rng.randint(0, 256, shape + (3,), np.uint8)
            whole = pred.predict_mask(img)
            blocked = LS.predict_mask_blocked(pred, img, max_block_tiles=4)
            np.testing.assert_array_equal(blocked, whole, err_msg=str(shape))

    def test_single_tile_blocks(self):
        pred = make_predictor()
        rng = np.random.RandomState(2)
        img = rng.randint(0, 256, (100, 100, 3), np.uint8)
        np.testing.assert_array_equal(
            LS.predict_mask_blocked(pred, img, max_block_tiles=1),
            pred.predict_mask(img),
        )

    def test_in_flight_blocks_bounded(self):
        """Device memory stays O(max_in_flight): never more than the window
        of dispatched-but-unfetched blocks (the module's whole purpose —
        an unbounded queue would OOM exactly the scenes this path exists
        for)."""
        pred = make_predictor()
        live = {"now": 0, "peak": 0}
        real_dispatch, real_fetch = pred.dispatch, pred.fetch

        def dispatch(img):
            live["now"] += 1
            live["peak"] = max(live["peak"], live["now"])
            return real_dispatch(img)

        def fetch(d):
            live["now"] -= 1
            return real_fetch(d)

        pred.dispatch, pred.fetch = dispatch, fetch
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (300, 300, 3), np.uint8)
        blocked = LS.predict_mask_blocked(
            pred, img, max_block_tiles=2, max_in_flight=3
        )
        pred.dispatch, pred.fetch = real_dispatch, real_fetch
        assert live["peak"] <= 3 and live["now"] == 0
        n_blocks = len(LS.plan_blocks(300, 300, CFG, 2))
        assert n_blocks > 3  # the bound was actually exercised
        np.testing.assert_array_equal(blocked, pred.predict_mask(img))


class TestBlockedEnsemble:
    def _members(self):
        x = jax.ShapeDtypeStruct((1, CFG.tile, CFG.tile, 3), jnp.float32)
        p1, s1 = M.init(tiny_model, jax.random.key(0), x)
        p2, s2 = M.init(tiny_model2, jax.random.key(1), x)
        return {"a": (tiny_model, p1, s1), "b": (tiny_model2, p2, s2)}

    def test_bit_equal_to_whole_scene(self):
        fused = FusedEnsemblePredictor(
            self._members(), CFG, batch_tiles=8, compute_dtype=jnp.float32
        )
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (170, 250, 3), np.uint8)
        whole = fused.predict_masks(img)
        blocked = LS.predict_masks_blocked(fused, img, max_block_tiles=6)
        assert set(blocked) == set(whole)
        for k in whole:
            np.testing.assert_array_equal(blocked[k], whole[k], err_msg=k)

    def test_bucketed_config_also_exact(self):
        cfg = TilerConfig(tile=32, stride=24, overlap=8, bucket_sizes=True)
        fused = FusedEnsemblePredictor(
            self._members(), cfg, batch_tiles=8, compute_dtype=jnp.float32
        )
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (140, 200, 3), np.uint8)
        whole = fused.predict_masks(img)
        blocked = LS.predict_masks_blocked(fused, img, max_block_tiles=4)
        for k in whole:
            np.testing.assert_array_equal(blocked[k], whole[k], err_msg=k)


class TestPipelineAutoBlocking:
    def test_big_scene_routes_through_blocks_and_matches(self):
        from building_detection_tpu.infer.pipeline import Pipeline

        cfg = dataclasses.replace(
            Config(),
            tiler=CFG,
            # vote over the 2-model test zoo instead of the real five
            fuse=dataclasses.replace(
                Config().fuse, num_models=2, vote_threshold=1
            ),
        )
        # tiny zoo stand-ins keep this CPU-fast; threshold forces blocking
        import building_detection_tpu.models.registry as R

        saved_reg = dict(R.MODEL_REGISTRY)
        R.MODEL_REGISTRY.update({"a": tiny_model, "b": tiny_model2})
        try:
            pipe_small = Pipeline(
                cfg=cfg, batch_tiles=8, compute_dtype=jnp.float32,
                models=("a", "b"), max_scene_tiles=None,
            )
            pipe_blocked = Pipeline(
                cfg=cfg, batch_tiles=8, compute_dtype=jnp.float32,
                models=("a", "b"), max_scene_tiles=6,
            )
            rng = np.random.RandomState(5)
            img = rng.randint(0, 256, (150, 220, 3), np.uint8)
            assert pipe_blocked._needs_blocking(img)
            want = pipe_small.predict_image(img)
            got = pipe_blocked.predict_image(img)
            np.testing.assert_array_equal(got.fused, want.fused)
            for k in want.masks:
                np.testing.assert_array_equal(got.masks[k], want.masks[k])
            assert got.corners == want.corners
            # batch path: one big (blocked) + one small scene together
            small = rng.randint(0, 256, (40, 40, 3), np.uint8)
            res = pipe_blocked.predict_images([img, small])
            np.testing.assert_array_equal(res[0].fused, want.fused)
            np.testing.assert_array_equal(
                res[1].fused, pipe_small.predict_image(small).fused
            )
        finally:
            R.MODEL_REGISTRY.clear()
            R.MODEL_REGISTRY.update(saved_reg)
