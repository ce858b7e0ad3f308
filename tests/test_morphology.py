"""Morphology ops vs the OpenCV oracle (cv2 is available in CI as a test
dependency only; the framework itself never imports it)."""
import cv2 as cv
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.ops import morphology as morph


def random_mask(seed, shape=(64, 64), p=0.4):
    rng = np.random.RandomState(seed)
    m = (rng.rand(*shape) < p).astype(np.uint8) * 255
    # add some blobs
    m = cv.dilate(m, np.ones((3, 3), np.uint8))
    return m


@pytest.mark.parametrize("kernel,iters", [((1, 5), 5), ((5, 1), 5), ((3, 3), 5), ((1, 7), 1), ((7, 1), 1), ((3, 3), 1)])
def test_erode_matches_cv2(kernel, iters):
    m = random_mask(0)
    expected = cv.erode(m, np.ones(kernel, np.uint8), iterations=iters)
    got = np.asarray(morph.erode(jnp.asarray(m), kernel, iters))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("kernel,iters", [((1, 5), 5), ((5, 1), 5), ((3, 3), 5), ((3, 3), 1)])
def test_dilate_matches_cv2(kernel, iters):
    m = random_mask(1)
    expected = cv.dilate(m, np.ones(kernel, np.uint8), iterations=iters)
    got = np.asarray(morph.dilate(jnp.asarray(m), kernel, iters))
    np.testing.assert_array_equal(got, expected)


def test_float_labels_match_cv2():
    """The training harness erodes float {0,1} labels (res34.py:85)."""
    lab = (random_mask(2) / 255.0).astype(np.float32)
    expected = cv.erode(lab, np.ones((3, 3), np.uint8), iterations=5)
    got = np.asarray(morph.erode(jnp.asarray(lab), 3, 5))
    np.testing.assert_allclose(got, expected)


def test_batched():
    ms = np.stack([random_mask(i) for i in range(4)])
    got = np.asarray(morph.erode(jnp.asarray(ms), (1, 5), 5))
    for i in range(4):
        expected = cv.erode(ms[i], np.ones((1, 5), np.uint8), iterations=5)
        np.testing.assert_array_equal(got[i], expected)


def test_edge_weight_maps_match_reference_recipe():
    """Pixel-exact vs the cv2 recipe in train_model/res34.py:81-104."""
    lab = (random_mask(3, (128, 128)) / 255.0).astype(np.float32)
    kernel = np.ones((3, 3), np.uint8)
    erode_ref = cv.erode(lab, kernel, iterations=5)
    p_ref = np.where((lab - erode_ref) == 1, 2.0, 1.0)
    dil_ref = cv.dilate(lab, kernel, iterations=5)
    f_ref = np.where((dil_ref - lab) == 1, 2.0, 1.0)

    f_edge, p_edge = morph.edge_weight_maps(jnp.asarray(lab))
    np.testing.assert_array_equal(np.asarray(p_edge), p_ref)
    np.testing.assert_array_equal(np.asarray(f_edge), f_ref)


def test_majority_vote():
    masks = jnp.asarray(
        np.stack([random_mask(i) // 255 for i in range(5)]).astype(np.uint8)
    )
    got = np.asarray(morph.majority_vote(masks, 3))
    expected = np.where(np.asarray(masks).astype(np.int32).sum(0) >= 3, 255, 0).astype(
        np.uint8
    )
    np.testing.assert_array_equal(got, expected)


def test_fill_holes():
    m = np.zeros((32, 32), np.uint8)
    cv.rectangle(m, (4, 4), (27, 27), 1, -1)
    m[10:20, 10:20] = 0  # carve a hole
    m[0:2, 0:2] = 0  # background notch stays background
    got = np.asarray(morph.fill_holes(jnp.asarray(m)))
    expected = np.zeros_like(m)
    cv.rectangle(expected, (4, 4), (27, 27), 1, -1)
    np.testing.assert_array_equal(got, expected)
