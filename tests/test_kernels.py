"""Pallas kernels vs their XLA fallbacks (interpret mode on CPU)."""
import cv2 as cv
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.kernels.pallas_morphology import edge_weight_maps_pallas
from building_detection_tpu.ops import morphology as morph


def labels(seed, n=2, hw=64):
    rng = np.random.RandomState(seed)
    lab = (rng.rand(n, hw, hw) < 0.35).astype(np.uint8) * 255
    lab = np.stack([cv.dilate(l, np.ones((3, 3), np.uint8)) for l in lab])
    return (lab / 255.0).astype(np.float32)


class TestEdgeWeightMapsPallas:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_xla_implementation(self, seed):
        lab = labels(seed)
        f_ref, p_ref = morph.edge_weight_maps(jnp.asarray(lab))
        f_got, p_got = edge_weight_maps_pallas(jnp.asarray(lab), interpret=True)
        np.testing.assert_array_equal(np.asarray(f_got), np.asarray(f_ref))
        np.testing.assert_array_equal(np.asarray(p_got), np.asarray(p_ref))

    def test_matches_cv2_recipe_directly(self):
        lab = labels(9, n=1, hw=96)
        f_got, p_got = edge_weight_maps_pallas(jnp.asarray(lab), interpret=True)
        kernel = np.ones((3, 3), np.uint8)
        l0 = lab[0]
        erode = cv.erode(l0, kernel, iterations=5)
        p_exp = np.where((l0 - erode) == 1, 2.0, 1.0)
        dil = cv.dilate(l0, kernel, iterations=5)
        f_exp = np.where((dil - l0) == 1, 2.0, 1.0)
        np.testing.assert_array_equal(np.asarray(p_got)[0], p_exp)
        np.testing.assert_array_equal(np.asarray(f_got)[0], f_exp)
