"""Fusion + edge pipelines vs the literal cv2 re-enactment of the reference
(tests/reference_oracle.py)."""
import cv2 as cv
import numpy as np
import pytest

import reference_oracle as oracle
from building_detection_tpu.post import edges as E
from building_detection_tpu.post import fusion as F


def building_mask(seed, shape=(128, 128), n=5, holes=True):
    """Masks resembling tiled-inference outputs: rectangles + blobs + noise."""
    rng = np.random.RandomState(seed)
    m = np.zeros(shape, np.uint8)
    for _ in range(n):
        x, y = rng.randint(0, shape[1] - 30), rng.randint(0, shape[0] - 30)
        w, h = rng.randint(8, 45), rng.randint(8, 45)
        cv.rectangle(m, (x, y), (min(x + w, shape[1] - 1), min(y + h, shape[0] - 1)), 255, -1)
    for _ in range(3):
        cx, cy = rng.randint(10, shape[1] - 10), rng.randint(10, shape[0] - 10)
        cv.ellipse(m, (cx, cy), (rng.randint(4, 16), rng.randint(4, 16)), rng.randint(0, 180), 0, 360, 255, -1)
    if holes:
        for _ in range(3):
            cx, cy = rng.randint(10, shape[1] - 10), rng.randint(10, shape[0] - 10)
            cv.circle(m, (cx, cy), rng.randint(2, 6), 0, -1)
    # speckle noise (small fragments to be cleaned)
    for _ in range(10):
        x, y = rng.randint(0, shape[1] - 3), rng.randint(0, shape[0] - 3)
        m[y : y + 2, x : x + 2] = 255
    return m


class TestProcessMask:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_reference(self, seed):
        m = building_mask(seed)
        ours = F.process_mask(m)
        theirs = oracle.process_one_mask(m)
        np.testing.assert_array_equal(ours, theirs)

    def test_blank_mask(self):
        m = np.zeros((64, 64), np.uint8)
        np.testing.assert_array_equal(F.process_mask(m), m)


class TestFuseMasks:
    @pytest.mark.parametrize("base_seed", [0, 100, 200])
    def test_matches_reference(self, base_seed):
        masks = [building_mask(base_seed + i) for i in range(5)]
        ours = F.fuse_masks(masks)
        theirs = oracle.model_confuse(masks)
        np.testing.assert_array_equal(ours, theirs)

    def test_wrong_count_raises(self):
        with pytest.raises(ValueError, match="expected 5"):
            F.fuse_masks([np.zeros((8, 8), np.uint8)] * 4)


class TestExtractPolygons:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_reference(self, seed):
        m = oracle.model_confuse([building_mask(seed + 10 * i) for i in range(5)])
        ours, h_ours = E.extract_polygons(m)
        theirs, h_theirs = oracle.detection_points(m)
        assert h_ours == h_theirs
        assert len(ours) == len(theirs), (
            f"{len(ours)} polygons vs reference {len(theirs)}"
        )
        ours_set = {
            tuple((float(x), float(y)) for x, y in zip(p[0], p[1])) for p in ours
        }
        theirs_set = {
            tuple((float(x), float(y)) for x, y in zip(p[0], p[1])) for p in theirs
        }
        assert ours_set == theirs_set

    def test_blank(self):
        corners, h = E.extract_polygons(np.zeros((64, 64), np.uint8))
        assert corners == [] and h == 64


class TestRingOrder:
    """Regression guard for cv2's reverse-raster ring order (caught by the
    10k fuzz, scripts/fuzz_parity.py): extract_polygons must emit rings in
    exactly cv2's enumeration order, not raster-discovery order."""

    def test_multi_ring_order_matches_oracle(self):
        m = np.zeros((200, 240), np.uint8)
        # three well-separated buildings, raster order top-left -> bottom
        cv.rectangle(m, (10, 10), (60, 50), 255, -1)
        cv.rectangle(m, (150, 80), (220, 140), 255, -1)
        cv.rectangle(m, (30, 150), (110, 190), 255, -1)
        ours, h_ours = E.extract_polygons(m)
        theirs, h_theirs = oracle.detection_points(m)
        assert h_ours == h_theirs
        assert len(ours) == len(theirs) == 3
        assert ours == theirs  # ordered, point-exact
        # and the order is NOT raster order: cv2 enumerates bottom-up
        first_ys = [min(r[1][:-1]) for r in ours]
        assert first_ys == sorted(first_ys, reverse=True)


class TestNativeFusion:
    """C++ bd_process_mask / bd_morph vs the pure NumPy implementations,
    bit-for-bit (the native path computes per-component crops; the Python
    path full-size canvases — same algorithm, model_fuse.py:9-218)."""

    def _require_native(self):
        from building_detection_tpu.post import geometry as G
        if G._nat is None or not hasattr(G._nat, "process_mask"):
            pytest.skip("native library unavailable")
        return G

    @pytest.mark.parametrize("seed", range(6))
    def test_process_mask_native_eq_python(self, seed):
        self._require_native()
        m = building_mask(seed, shape=(160, 130), n=8)
        np.testing.assert_array_equal(F.process_mask(m), F._process_mask_py(m))

    def test_dense_and_border_touching(self):
        self._require_native()
        rng = np.random.RandomState(7)
        m = (rng.rand(96, 96) < 0.55).astype(np.uint8) * 255
        m[:12, :] = 255
        m[:, -9:] = 255
        np.testing.assert_array_equal(F.process_mask(m), F._process_mask_py(m))

    def test_morph_native_eq_scipy(self):
        G = self._require_native()
        from scipy import ndimage
        rng = np.random.RandomState(3)
        m = (rng.rand(70, 90) < 0.5).astype(np.uint8) * 255
        for kern in [(1, 5), (5, 1), (1, 7), (7, 1), (3, 3)]:
            for it in (1, 5):
                size = (it * (kern[0] - 1) + 1, it * (kern[1] - 1) + 1)
                np.testing.assert_array_equal(
                    G.erode_np(m, kern, it),
                    ndimage.minimum_filter(m, size=size, mode="constant", cval=255),
                )
                np.testing.assert_array_equal(
                    G.dilate_np(m, kern, it),
                    ndimage.maximum_filter(m, size=size, mode="constant", cval=0),
                )

    def test_extract_polygons_native_eq_fallback(self, monkeypatch):
        from building_detection_tpu.post import geometry as G
        self._require_native()
        m = building_mask(11, shape=(140, 150), n=7)
        fused = F.fuse_masks([building_mask(11 + i, shape=(140, 150)) for i in range(5)])
        native = E.extract_polygons(fused)
        monkeypatch.setattr(G, "_nat", None)
        fallback = E.extract_polygons(fused)
        assert native[1] == fallback[1]
        assert len(native[0]) == len(fallback[0])
        for (ax, ay), (bx, by) in zip(native[0], fallback[0]):
            assert list(ax) == list(bx) and list(ay) == list(by)
