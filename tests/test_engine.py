"""End-to-end tiled inference vs a literal numpy re-enactment of the
reference hot loop (`/root/reference/predict.py:90-116`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import TilerConfig
from building_detection_tpu.infer.engine import TiledPredictor
from building_detection_tpu.nn import layers as L
from building_detection_tpu.ops import tiling as T

CFG = TilerConfig(tile=32, stride=24, overlap=8)


def tiny_model(s, x):
    x = L.conv2d(s, x, 8, 3, strides=2, activation="relu")
    x = L.conv2d_transpose(s, x, 8, 2, strides=2, activation="relu")
    return L.conv2d(s, x, 2, 3, activation="softmax")


def reference_loop(image_rgb, apply_fn, cfg=CFG):
    """predict.py:90-116 in numpy (with the non-square fix)."""
    img = image_rgb / 127.5 - 1
    h, w = img.shape[:2]
    n_h = max(-(-(h - cfg.overlap) // cfg.stride), 0)
    n_w = max(-(-(w - cfg.overlap) // cfg.stride), 0)
    new_h = max(n_h * cfg.stride + cfg.overlap, cfg.tile)
    new_w = max(n_w * cfg.stride + cfg.overlap, cfg.tile)
    tmp = np.zeros((new_h, new_w, 3))
    pred = np.zeros((new_h, new_w), np.int8)
    tmp[:h, :w] = img
    for i in range(0, new_h - cfg.overlap, cfg.stride):
        for j in range(0, new_w - cfg.overlap, cfg.stride):
            part = tmp[i : i + cfg.tile, j : j + cfg.tile][None].astype(np.float32)
            probs = np.asarray(apply_fn(jnp.asarray(part)))[0]
            pred[i : i + cfg.tile, j : j + cfg.tile] += probs.argmax(-1).astype(np.int8)
    return np.where(pred >= 1, 255, 0).astype(np.uint8)[:h, :w]


def make_predictor():
    x = jax.ShapeDtypeStruct((1, CFG.tile, CFG.tile, 3), jnp.float32)
    params, state = M.init(tiny_model, jax.random.key(0), x)
    pred = TiledPredictor(
        tiny_model, params, state, CFG, batch_tiles=3, compute_dtype=jnp.float32
    )
    apply_fn = jax.jit(lambda t: M.apply(tiny_model, params, state, t)[0])
    return pred, apply_fn


class TestTiledPredictor:
    def test_matches_reference_loop_square(self):
        pred, apply_fn = make_predictor()
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (56, 56, 3), np.uint8)
        np.testing.assert_array_equal(
            pred.predict_mask(img), reference_loop(img, apply_fn)
        )

    def test_matches_reference_loop_nonsquare(self):
        pred, apply_fn = make_predictor()
        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, (40, 81, 3), np.uint8)
        np.testing.assert_array_equal(
            pred.predict_mask(img), reference_loop(img, apply_fn)
        )

    def test_small_scene_single_tile(self):
        pred, apply_fn = make_predictor()
        rng = np.random.RandomState(2)
        img = rng.randint(0, 256, (20, 20, 3), np.uint8)
        np.testing.assert_array_equal(
            pred.predict_mask(img), reference_loop(img, apply_fn)
        )

    def test_degenerate_scene_blank(self):
        pred, _ = make_predictor()
        img = np.full((6, 6, 3), 200, np.uint8)
        np.testing.assert_array_equal(pred.predict_mask(img), np.zeros((6, 6), np.uint8))


class TestLegacyNonSquareReplication:
    def test_buggy_loop_replicated_exactly(self):
        """fix_nonsquare_bug=False reproduces the reference's width-over-new_h
        loop (predict.py:106) end to end, including the mis-tiled region."""
        cfg = TilerConfig(tile=32, stride=24, overlap=8, fix_nonsquare_bug=False)
        x = jax.ShapeDtypeStruct((1, CFG.tile, CFG.tile, 3), jnp.float32)
        params, state = M.init(tiny_model, jax.random.key(0), x)
        pred = TiledPredictor(
            tiny_model, params, state, cfg, batch_tiles=3, compute_dtype=jnp.float32
        )
        apply_fn = jax.jit(lambda t: M.apply(tiny_model, params, state, t)[0])
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (40, 81, 3), np.uint8)  # wide scene

        # literal reference loop: BOTH loops over the height-derived count
        image = img / 127.5 - 1
        h, w = image.shape[:2]
        n_h = max(-(-(h - cfg.overlap) // cfg.stride), 0)
        n_w = max(-(-(w - cfg.overlap) // cfg.stride), 0)
        new_h = max(n_h * cfg.stride + cfg.overlap, cfg.tile)
        new_w = max(n_w * cfg.stride + cfg.overlap, cfg.tile)
        tmp = np.zeros((new_h, new_w, 3))
        acc = np.zeros((new_h, new_w), np.int8)
        tmp[:h, :w] = image
        for i in range(0, new_h - cfg.overlap, cfg.stride):
            for j in range(0, new_h - cfg.overlap, cfg.stride):  # the bug
                part = tmp[i : i + cfg.tile, j : j + cfg.tile][None].astype(np.float32)
                probs = np.asarray(apply_fn(jnp.asarray(part)))[0]
                acc[i : i + cfg.tile, j : j + cfg.tile] += probs.argmax(-1).astype(np.int8)
        expected = np.where(acc >= 1, 255, 0).astype(np.uint8)[:h, :w]

        np.testing.assert_array_equal(pred.predict_mask(img), expected)

    def test_tall_scene_raises_like_reference(self):
        """On TALL scenes the reference's overrunning inner loop feeds the
        model numpy-TRUNCATED tiles (first one ``overlap`` wide, then empty)
        and the Keras zoo crashes with a decoder concat shape mismatch
        (verified against the real reference under tf_keras 2.21).  The
        faithful replication of a crash is a loud error, not a silent
        origin clamp."""
        cfg = TilerConfig(tile=32, stride=24, overlap=8, fix_nonsquare_bug=False)
        with pytest.raises(ValueError, match="tall scene"):
            T.plan_tiles(81, 40, cfg)
        # wide and square scenes still plan (wide = replicated under-tiling)
        assert T.plan_tiles(40, 81, cfg).num_tiles > 0
        assert T.plan_tiles(81, 81, cfg).num_tiles > 0
        # width <= overlap with a single tile row fits the min-size canvas
        assert T.plan_tiles(30, 6, cfg).num_tiles == 1


class TestBucketedPrograms:
    def test_bucketed_output_identical_and_programs_shared(self):
        cfg = TilerConfig(tile=32, stride=24, overlap=8, bucket_sizes=True)
        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        params, state = M.init(tiny_model, jax.random.key(0), x)
        bucketed = TiledPredictor(
            tiny_model, params, state, cfg, batch_tiles=3, compute_dtype=jnp.float32
        )
        plain = TiledPredictor(
            tiny_model, params, state,
            TilerConfig(tile=32, stride=24, overlap=8),
            batch_tiles=3, compute_dtype=jnp.float32,
        )
        rng = np.random.RandomState(4)
        sizes = [(40, 81), (56, 56), (70, 100), (33, 47)]
        imgs = {hw: rng.randint(0, 256, (*hw, 3), np.uint8) for hw in sizes}
        # run the plain predictor first, then snapshot the (class-shared)
        # compile cache and measure how many NEW programs bucketing needs
        plain_masks = {hw: plain.predict_mask(imgs[hw]) for hw in sizes}
        misses_before = TiledPredictor._compiled.cache_info().misses
        for hw in sizes:
            np.testing.assert_array_equal(
                bucketed.predict_mask(imgs[hw]), plain_masks[hw], err_msg=str(hw)
            )
        new_programs = TiledPredictor._compiled.cache_info().misses - misses_before
        assert new_programs <= 3, new_programs  # 4 scene sizes share <=3 programs
