"""Host geometry vs the OpenCV oracle.

cv2 is used here ONLY as a test oracle; the framework's post-processing
(`building_detection_tpu.post`) never imports it.
"""
import cv2 as cv
import numpy as np
import pytest

from building_detection_tpu.post import geometry as G


def blob_mask(seed, shape=(96, 96), n_blobs=6):
    rng = np.random.RandomState(seed)
    m = np.zeros(shape, np.uint8)
    for _ in range(n_blobs):
        cx, cy = rng.randint(8, shape[1] - 8), rng.randint(8, shape[0] - 8)
        w, h = rng.randint(3, 25), rng.randint(3, 25)
        ang = rng.randint(0, 180)
        cv.ellipse(m, (cx, cy), (w, h), ang, 0, 360, 255, -1)
    # carve some holes
    for _ in range(3):
        cx, cy = rng.randint(8, shape[1] - 8), rng.randint(8, shape[0] - 8)
        cv.circle(m, (cx, cy), rng.randint(2, 5), 0, -1)
    return m


def cv2_contours(mask):
    res = cv.findContours(mask.copy(), cv.RETR_EXTERNAL, cv.CHAIN_APPROX_NONE)
    return res[0] if len(res) == 2 else res[1]


def as_cyclic_tuple(c):
    pts = [tuple(p) for p in np.asarray(c).reshape(-1, 2)]
    # canonical rotation: start at lexicographically smallest point
    k = pts.index(min(pts))
    return tuple(pts[k:] + pts[:k])


class TestFindContours:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_cv2_point_sequences(self, seed):
        m = blob_mask(seed)
        ours = G.find_contours(m)
        theirs = cv2_contours(m)
        assert len(ours) == len(theirs)
        ours_set = {as_cyclic_tuple(c) for c in ours}
        theirs_set = {as_cyclic_tuple(c) for c in theirs}
        assert ours_set == theirs_set

    def test_nested_component_excluded(self):
        m = np.zeros((40, 40), np.uint8)
        cv.rectangle(m, (5, 5), (34, 34), 255, -1)
        cv.rectangle(m, (12, 12), (27, 27), 0, -1)  # hole
        cv.rectangle(m, (17, 17), (22, 22), 255, -1)  # island inside hole
        ours = G.find_contours(m)
        theirs = cv2_contours(m)
        assert len(ours) == len(theirs) == 1  # RETR_EXTERNAL drops the island

    def test_single_pixel(self):
        m = np.zeros((10, 10), np.uint8)
        m[4, 7] = 255
        (c,) = G.find_contours(m)
        np.testing.assert_array_equal(c, [[7, 4]])


class TestAnalytics:
    @pytest.mark.parametrize("seed", range(6))
    def test_area_rect_arclength_moments(self, seed):
        m = blob_mask(seed)
        for c in cv2_contours(m):
            ours_c = c.reshape(-1, 2)
            assert G.contour_area(ours_c) == pytest.approx(cv.contourArea(c), abs=1e-6)
            assert G.bounding_rect(ours_c) == tuple(cv.boundingRect(c))
            assert G.arc_length(ours_c) == pytest.approx(
                cv.arcLength(c, True), rel=1e-9
            )
            assert G.moments_m00(ours_c) == pytest.approx(
                cv.moments(c)["m00"], abs=1e-6
            )


class TestApproxPolyDP:
    @pytest.mark.parametrize("seed", range(6))
    @pytest.mark.parametrize("rate", [0.01, 0.005, 0.002, 0.05])
    def test_matches_cv2(self, seed, rate):
        m = blob_mask(seed)
        for c in cv2_contours(m):
            if len(c) < 5:
                continue
            eps = rate * cv.arcLength(c, True)
            theirs = cv.approxPolyDP(c, eps, True).reshape(-1, 2)
            ours = G.approx_poly_dp(c.reshape(-1, 2), eps, True)
            assert as_cyclic_tuple(ours) == as_cyclic_tuple(theirs), (
                f"seed={seed} rate={rate}\nours={ours}\ntheirs={theirs}"
            )

    @pytest.mark.parametrize("seed", range(40))
    def test_adversarial_masks_exact(self, seed):
        """Self-touching noise/checker/line-web contours, point-for-point
        EQUAL (not just cyclically) vs cv2.  A 64,954-contour fuzz of this
        protocol showed zero divergence; these seeds pin a sample of it."""
        rng = np.random.RandomState(seed)
        kind = seed % 4
        size = rng.randint(16, 64)
        if kind == 0:
            m = (rng.rand(size, size) < rng.uniform(0.3, 0.7)).astype(np.uint8) * 255
        elif kind == 1:
            m = np.zeros((size, size), np.uint8)
            for _ in range(rng.randint(1, 6)):
                cv.circle(m, (rng.randint(0, size), rng.randint(0, size)),
                          rng.randint(1, 10), 255, -1)
        elif kind == 2:
            m = (np.indices((size, size)).sum(0) % rng.randint(2, 4) == 0).astype(np.uint8) * 255
            m[rng.rand(size, size) < 0.2] = 0
        else:
            m = np.zeros((size, size), np.uint8)
            for _ in range(rng.randint(2, 8)):
                cv.line(m, tuple(rng.randint(0, size, 2)),
                        tuple(rng.randint(0, size, 2)), 255, 1)
        for c in cv2_contours(m):
            peri = cv.arcLength(c, True)
            for rate in (0.01, 0.05, 0.002):
                eps = rate * peri
                theirs = cv.approxPolyDP(c, eps, True).reshape(-1, 2)
                ours = G.approx_poly_dp(c.reshape(-1, 2), eps, True)
                np.testing.assert_array_equal(ours, theirs)

    @pytest.mark.parametrize("seed", range(12))
    def test_open_curves_match_cv2(self, seed):
        rng = np.random.RandomState(100 + seed)
        for _ in range(40):
            m = rng.randint(3, 30)
            pts = rng.randint(0, 40, (m, 2)).astype(np.int32)
            eps = rng.uniform(0.2, 8.0)
            theirs = cv.approxPolyDP(pts.reshape(-1, 1, 2), eps, False).reshape(-1, 2)
            ours = G.approx_poly_dp(pts, eps, False)
            np.testing.assert_array_equal(ours, theirs)


class TestMinAreaRect:
    @pytest.mark.parametrize("seed", range(6))
    def test_same_rectangle(self, seed):
        m = blob_mask(seed)
        for c in cv2_contours(m):
            if len(c) < 5:
                continue
            theirs = cv.minAreaRect(c)
            ours = G.min_area_rect(c.reshape(-1, 2))
            assert ours[1][0] * ours[1][1] == pytest.approx(
                theirs[1][0] * theirs[1][1], rel=1e-6, abs=1e-6
            )
            tb = cv.boxPoints(theirs)
            ob = G.box_points(ours)
            # ORDERED, bit-exact comparison: min_area_rect replicates cv2's
            # hull ordering + f32 rotating calipers + angle normalisation
            np.testing.assert_array_equal(ob, tb)

    def test_cv2_bit_exact_fuzz(self):
        """min_area_rect == cv2.minAreaRect on adversarial contours: every
        angle and corner phase identical; coordinates bit-equal except <=1 ulp
        on exact-area ties (cv2's FMA contraction; docs/QUIRKS.md)."""
        rng = np.random.RandomState(7)
        n = exact = 0
        for t in range(2000):
            kind = t % 5
            if kind == 0:
                pts = rng.randint(0, 60, (rng.randint(3, 20), 2))
            elif kind == 1:
                pts = rng.randint(0, 8, (rng.randint(3, 20), 2)) * 7
            elif kind == 2:
                pts = rng.randint(0, 4000, (rng.randint(3, 30), 2))
            elif kind == 3:
                k = int(rng.randint(3, 15))
                pts = np.stack(
                    [rng.randint(0, 500, (k,)), rng.randint(0, 4, (k,))], axis=-1
                )
            else:  # collinear sets, incl. vertical/horizontal pairs
                k = int(rng.randint(2, 8))
                x0, y0 = rng.randint(0, 100, 2)
                dx, dy = rng.randint(-20, 20, 2)
                ts = rng.randint(0, 10, k)
                pts = np.stack([x0 + ts * dx, y0 + ts * dy], axis=-1)
            pts = pts.astype(np.int32)
            ref = cv.minAreaRect(pts.reshape(-1, 1, 2))
            got = G.min_area_rect(pts)
            n += 1
            # angle (and therefore boxPoints corner ORDER) must always match
            assert np.float32(ref[2]) == np.float32(got[2]), (t, ref, got)
            vals_ref = np.float32([ref[0][0], ref[0][1], ref[1][0], ref[1][1]])
            vals_got = np.float32([got[0][0], got[0][1], got[1][0], got[1][1]])
            if np.array_equal(vals_ref, vals_got):
                exact += 1
            else:  # exact-area tie: a different winning caliper position,
                # coordinates agree to a few ulp (rel ~1e-6)
                np.testing.assert_allclose(vals_got, vals_ref, rtol=1e-6, atol=1e-4)
        assert exact / n > 0.99, f"only {exact}/{n} bit-exact"

    def test_convex_hull_cv2_order_exact(self):
        """convex_hull_cv2 == cv2.convexHull incl. output ORDER."""
        rng = np.random.RandomState(5)
        for t in range(1500):
            kind = t % 5
            if kind == 0:
                pts = rng.randint(0, 40, (rng.randint(3, 20), 2))
            elif kind == 1:
                pts = rng.randint(0, 6, (rng.randint(3, 20), 2)) * 5
            elif kind == 2:
                pts = rng.randint(0, 2000, (rng.randint(3, 30), 2))
            elif kind == 3:
                k = int(rng.randint(3, 15))
                pts = np.stack(
                    [rng.randint(0, 200, (k,)), rng.randint(0, 3, (k,))], axis=-1
                )
            else:  # duplicates-heavy
                pts = rng.randint(0, 6, (rng.randint(3, 20), 2))
            pts = pts.astype(np.int32)
            ref = cv.convexHull(pts.reshape(-1, 1, 2), clockwise=False).reshape(-1, 2)
            got = G.convex_hull_cv2(pts, clockwise=False)
            np.testing.assert_array_equal(got.astype(ref.dtype), ref)


class TestRaster:
    @pytest.mark.parametrize("seed", range(6))
    def test_fill_holes_matches_fillpoly_trick(self, seed):
        m = blob_mask(seed)
        cs = cv2_contours(m)
        expected = m.copy()
        for i in range(len(cs)):
            cv.fillPoly(expected, [cs[i]], 255)
        got = np.where(
            np.logical_or.reduce([f for f in G.components_filled(m)] or [m > 0]),
            255,
            0,
        ).astype(np.uint8)
        np.testing.assert_array_equal(got, expected)

    @pytest.mark.parametrize("seed", range(6))
    def test_components_match_drawcontours(self, seed):
        m = blob_mask(seed)
        cs = cv2_contours(m)
        expected_total = np.zeros_like(m)
        for i in range(len(cs)):
            cv.drawContours(expected_total, cs, i, 255, cv.FILLED)
        comps = G.components_filled(m)
        got = np.zeros_like(m)
        for f in comps:
            got |= f * 255
        np.testing.assert_array_equal(got, expected_total)

    @pytest.mark.parametrize("seed", range(4))
    def test_draw_contours_filled_on_traced(self, seed):
        """Rasterising our traced contours == cv2.drawContours FILLED."""
        m = blob_mask(seed)
        cs = cv2_contours(m)
        expected = np.zeros_like(m)
        for i in range(len(cs)):
            cv.drawContours(expected, cs, i, 255, cv.FILLED)
        got = G.draw_contours_filled(m.shape, [c.reshape(-1, 2) for c in cs])
        np.testing.assert_array_equal(got, expected)

    def test_erode_dilate_np_match_cv2(self):
        m = blob_mask(9)
        np.testing.assert_array_equal(
            G.erode_np(m, (1, 5), 5),
            cv.erode(m, np.ones((1, 5), np.uint8), iterations=5),
        )
        np.testing.assert_array_equal(
            G.dilate_np(m, (5, 1), 5),
            cv.dilate(m, np.ones((5, 1), np.uint8), iterations=5),
        )


class TestNativeFastPath:
    """C++ (native/src/geometry.cc) vs the NumPy fallback, bit-for-bit."""

    def setup_method(self):
        if G._nat is None:
            pytest.skip("native library unavailable")

    @pytest.mark.parametrize("seed", range(8))
    def test_find_contours_identical(self, seed):
        m = blob_mask(seed)
        native = G._nat.find_contours((m != 0).astype(np.uint8))
        fallback = G._find_contours_py((m != 0).astype(np.uint8))
        assert len(native) == len(fallback)
        for a, b in zip(native, fallback):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("seed", range(4))
    def test_fill_holes_identical(self, seed):
        m = (blob_mask(seed) != 0).astype(np.uint8)
        from scipy import ndimage

        np.testing.assert_array_equal(
            G._nat.fill_holes(m), ndimage.binary_fill_holes(m).astype(np.uint8)
        )

    def test_speedup_on_big_mask(self):
        """The C++ path should beat pure-Python tracing comfortably."""
        import time

        m = blob_mask(0, shape=(1024, 1024), n_blobs=60)
        mb = (m != 0).astype(np.uint8)
        t0 = time.perf_counter()
        G._nat.find_contours(mb)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        G._find_contours_py(mb)
        t_py = time.perf_counter() - t0
        assert t_native < t_py, (t_native, t_py)


class TestPathologicalShapes:
    """Structured degenerate shapes (1-px lines, rings, checkerboards,
    touching corners) must match cv2 exactly end to end."""

    def cases(self):
        out = []
        m = np.zeros((64, 64), np.uint8); m[10, 5:60] = 255; out.append(m)
        m = np.zeros((64, 64), np.uint8); m[5:60, 33] = 255; out.append(m)
        m = np.zeros((64, 64), np.uint8)
        for i in range(50): m[5 + i, 5 + i] = 255
        out.append(m)
        m = np.zeros((96, 96), np.uint8)
        cv.circle(m, (48, 48), 40, 255, 2); cv.circle(m, (48, 48), 20, 255, 2)
        out.append(m)
        m = np.zeros((64, 64), np.uint8)
        for i in range(0, 64, 4):
            for j in range(0, 64, 4): m[i:i + 2, j:j + 2] = 255
        out.append(m)
        m = np.zeros((32, 32), np.uint8); m[4:14, 4:14] = 255; m[14:24, 14:24] = 255
        out.append(m)
        out.append(np.full((32, 32), 255, np.uint8))  # border-touching full frame
        return out

    def test_contours_and_dp_match_cv2(self):
        for idx, m in enumerate(self.cases()):
            ours = G.find_contours(m)
            theirs = cv2_contours(m)
            assert len(ours) == len(theirs), idx
            assert {as_cyclic_tuple(c) for c in ours} == {
                as_cyclic_tuple(c) for c in theirs
            }, idx
            for c in theirs:
                cc = c.reshape(-1, 2)
                assert G.contour_area(cc) == pytest.approx(
                    cv.contourArea(c), abs=1e-6
                )
                for rate in (0.01, 0.002, 0.05):
                    eps = rate * cv.arcLength(c, True)
                    a = G.approx_poly_dp(cc, eps, True)
                    b = cv.approxPolyDP(c, eps, True).reshape(-1, 2)
                    assert as_cyclic_tuple(a) == as_cyclic_tuple(b), (idx, rate)


class TestContourListOrder:
    """cv2 returns external contours in REVERSE raster-discovery order; the
    list order is user-visible through extract_polygons (ring order in the
    points dict), so it is pinned exactly."""

    @pytest.mark.parametrize("seed", range(12))
    def test_order_matches_cv2(self, seed):
        rng = np.random.RandomState(seed + 777)
        h, w = rng.randint(32, 160), rng.randint(32, 160)
        kind = seed % 3
        if kind == 0:
            m = blob_mask(seed)
        elif kind == 1:
            m = np.where(rng.rand(h, w) < 0.5, 255, 0).astype(np.uint8)
        else:
            c = rng.randint(2, 7)
            yy, xx = np.mgrid[0:h, 0:w]
            m = ((yy // c + xx // c) % 2 * 255).astype(np.uint8)
        ours = G.find_contours(m)
        theirs = cv2_contours(m)
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            np.testing.assert_array_equal(
                np.asarray(a).reshape(-1, 2), np.asarray(b).reshape(-1, 2)
            )

    def test_components_filled_aligned(self):
        m = np.zeros((40, 60), np.uint8)
        m[2:10, 2:12] = 255
        m[20:30, 30:50] = 255
        contours = G.find_contours(m)
        rasters = G.components_filled(m)
        for c, r in zip(contours, rasters):
            pts = np.asarray(c).reshape(-1, 2)
            assert r[pts[0, 1], pts[0, 0]]  # contour start lies on its raster
