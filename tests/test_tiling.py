"""Tiler geometry + on-device gather/scatter tests.

Geometry cases pin the reference's padding math (`/root/reference/predict.py:98-106`)
including degenerate small scenes, and document the fixed non-square behaviour.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from building_detection_tpu.core.config import TilerConfig
from building_detection_tpu.ops import tiling as T


def ref_axis(dim, overlap=152, stride=360, tile=512):
    n = max(math.ceil((dim - overlap) / stride), 0)
    return max(n * stride + overlap, tile), n


class TestGeometry:
    def test_512_is_single_tile(self):
        plan = T.plan_tiles(512, 512)
        assert (plan.canvas_h, plan.canvas_w) == (512, 512)
        assert plan.origins == ((0, 0),)

    def test_reference_padding_math(self):
        for dim in [513, 872, 1000, 1024, 2048, 5000]:
            plan = T.plan_tiles(dim, dim)
            canvas, n = ref_axis(dim)
            assert plan.canvas_h == canvas
            assert plan.num_tiles == n * n
            # last tile must end exactly at the canvas edge
            last = max(o[0] for o in plan.origins)
            assert last + 512 == plan.canvas_h

    def test_full_coverage(self):
        plan = T.plan_tiles(1000, 1000)
        covered = np.zeros((plan.canvas_h, plan.canvas_w), bool)
        for (r, c) in plan.origins:
            covered[r : r + 512, c : c + 512] = True
        assert covered.all()

    def test_degenerate_small_scene_has_no_tiles(self):
        # dims <= overlap produce zero tiles in the reference (blank mask);
        # behaviour preserved and documented (predict.py:98-106).
        plan = T.plan_tiles(100, 100)
        assert plan.num_tiles == 0
        assert (plan.canvas_h, plan.canvas_w) == (512, 512)

    def test_nonsquare_fixed_vs_replicated(self):
        fixed = T.plan_tiles(512, 1592)
        assert fixed.num_tiles == 1 * 4
        legacy = T.plan_tiles(512, 1592, TilerConfig(fix_nonsquare_bug=False))
        # reference iterates width over the height count (predict.py:106)
        assert legacy.num_tiles == 1 * 1


class TestDeviceOps:
    def test_extract_and_scatter_roundtrip(self):
        cfg = TilerConfig(tile=4, stride=3, overlap=1)
        plan = T.plan_tiles(7, 7, cfg)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (7, 7, 1), np.uint8)
        canvas = T.pad_scene(jnp.asarray(img), plan)
        origins = T.origins_array(plan)
        tiles = T.extract_tiles(canvas, origins, cfg.tile)
        assert tiles.shape == (plan.num_tiles, 4, 4, 1)
        for t, (r, c) in zip(np.asarray(tiles), plan.origins):
            np.testing.assert_array_equal(
                t, np.asarray(canvas)[r : r + 4, c : c + 4, :]
            )
        # scatter back binary tiles -> OR over overlaps
        masks = (tiles[..., 0] > 128).astype(jnp.uint8)
        out = T.scatter_or(masks, origins, (plan.canvas_h, plan.canvas_w))
        expected = np.zeros((plan.canvas_h, plan.canvas_w), np.uint8)
        for m, (r, c) in zip(np.asarray(masks), plan.origins):
            expected[r : r + 4, c : c + 4] |= m
        np.testing.assert_array_equal(np.asarray(out), expected)

    def test_normalize(self):
        img = jnp.asarray([[[0, 127, 255]]], jnp.uint8)
        out = np.asarray(T.normalize(img))
        np.testing.assert_allclose(out, [[[-1.0, 127 / 127.5 - 1, 255 / 127.5 - 1]]], rtol=1e-6)

    def test_normalize_reference_f64_exact(self):
        """The reference normalizes in numpy f64 and TF casts to f32 at the
        graph boundary (`predict.py:93`); plain f32 arithmetic is 1 ulp off
        for v=64..191 and flips rare argmax ties.  normalize() must match
        the f64-then-cast result bit-for-bit for EVERY uint8 value, under
        jit (XLA's divide-by-constant -> reciprocal-multiply rewrite is one
        of the ways this silently breaks; see the docstring)."""
        u8 = jnp.arange(256, dtype=jnp.uint8)
        want = (np.arange(256, dtype=np.float64) / 127.5 - 1).astype(np.float32)
        got = np.asarray(jax.jit(T.normalize)(u8))
        np.testing.assert_array_equal(got, want)


class TestBucketPlan:
    def test_bucket_shapes_and_origin_padding(self):
        cfg = TilerConfig()
        plan = T.plan_tiles(1000, 2048, cfg)  # 3 x 6 tiles
        b = T.bucket_plan(plan, cfg)
        # grid rounds up to 4 x 8 -> canvas 4*360+152, 8*360+152
        assert (b.canvas_h, b.canvas_w) == (4 * 360 + 152, 8 * 360 + 152)
        assert b.num_tiles == 32
        # padded origins repeat the last real origin (idempotent under OR)
        assert b.origins[: plan.num_tiles] == plan.origins
        assert set(b.origins[plan.num_tiles:]) == {plan.origins[-1]}
        # real origins untouched, within the real canvas
        assert max(o[0] for o in plan.origins) + cfg.tile <= plan.canvas_h

    def test_few_buckets_for_many_sizes(self):
        cfg = TilerConfig()
        keys = set()
        for dim in range(400, 3000, 173):
            plan = T.bucket_plan(T.plan_tiles(dim, dim, cfg), cfg)
            keys.add((plan.canvas_h, plan.canvas_w, plan.num_tiles))
        assert len(keys) <= 4  # 25 scene sizes -> at most 4 programs
