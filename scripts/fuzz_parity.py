"""Long-run parity fuzz: fusion + polygon extraction vs the cv2 oracle.

Each iteration builds five random building-like masks (plus adversarial
classes: dense salt-and-pepper noise, checkerboards, stripe patterns) and
asserts

* ``post.fusion.fuse_masks`` is PIXEL-exact vs the literal cv2 transcription
  of ``model_fuse.py`` (`tests/reference_oracle.py`), and
* ``post.edges.extract_polygons`` is POINT-exact vs the transcription of
  ``edge_3.py`` (int rings bit-exact; float minAreaRect-fallback rings
  bit-exact except rare cv2 caliper ties, accepted to <=4 f32 ulps per
  coordinate, counted, reported, and BOUNDED — more than a handful fails
  the run),

on every one.  The default 2,000 iterations extend the in-suite coverage
(`tests/test_fusion.py` runs a few dozen seeds); run
``python scripts/fuzz_parity.py [iters] [base_seed]`` and record the output
line.  Exits non-zero on the first divergence with a repro seed.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import cv2 as cv  # noqa: E402  (test oracle only; framework code bans cv2)

import reference_oracle as oracle  # noqa: E402
from test_fusion import building_mask  # noqa: E402

from building_detection_tpu.post import edges as E  # noqa: E402
from building_detection_tpu.post import fusion as F  # noqa: E402


def adversarial_mask(rng: np.random.RandomState, shape) -> np.ndarray:
    kind = rng.randint(4)
    h, w = shape
    if kind == 0:  # dense salt-and-pepper
        density = rng.uniform(0.2, 0.8)
        return np.where(rng.rand(h, w) < density, 255, 0).astype(np.uint8)
    if kind == 1:  # checkerboard, random cell size
        c = rng.randint(1, 9)
        yy, xx = np.mgrid[0:h, 0:w]
        return ((yy // c + xx // c) % 2 * 255).astype(np.uint8)
    if kind == 2:  # stripes (exercise the 1x5/5x1 erosion splitting)
        c = rng.randint(1, 7)
        yy = np.arange(h) if rng.rand() < 0.5 else np.arange(w)
        stripe = (yy // c % 2 * 255).astype(np.uint8)
        return (
            np.broadcast_to(stripe[:, None], (h, w))
            if stripe.shape[0] == h
            else np.broadcast_to(stripe[None, :], (h, w))
        ).copy()
    # touching rectangles grid
    m = np.zeros((h, w), np.uint8)
    step = rng.randint(8, 20)
    sz = step - rng.randint(1, 4)
    for y in range(0, h - sz, step):
        for x in range(0, w - sz, step):
            m[y : y + sz, x : x + sz] = 255
    return m


def _ulp_dist_f32(a: np.ndarray, b: np.ndarray) -> int:
    """Max per-element distance in float32 ulps (sign-aware lexicographic
    bit ordering, the standard monotone mapping)."""
    ai = np.float32(a).view(np.int32).astype(np.int64)
    bi = np.float32(b).view(np.int32).astype(np.int64)
    ai = np.where(ai < 0, np.int64(-(2**31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(2**31)) - bi, bi)
    return int(np.abs(ai - bi).max()) if ai.size else 0


#: max f32 ulps per coordinate a float (minAreaRect-fallback) ring may
#: diverge on a cv2 equal-area caliper tie (docs/QUIRKS.md); shared with
#: scripts/pipeline_fuzz.py so both fuzzes enforce one parity contract
TIE_MAX_ULP = 4


def float_ring_tie_ok(ga: np.ndarray, wa: np.ndarray) -> bool:
    """True iff the ring difference is an acceptable cv2 caliper-tie case:
    both rings FLOAT (int rings must be exact) and within TIE_MAX_ULP."""
    if np.all(ga == np.round(ga)) and np.all(wa == np.round(wa)):
        return False
    return _ulp_dist_f32(ga, wa) <= TIE_MAX_ULP


#: seeds whose float rings needed the caliper-tie allowance
ULP_CASES = []


def one_iteration(seed: int) -> None:
    rng = np.random.RandomState(seed)
    hw = (rng.randint(48, 257), rng.randint(48, 257))
    masks = []
    for k in range(5):
        if rng.rand() < 0.25:
            masks.append(adversarial_mask(rng, hw))
        else:
            masks.append(
                building_mask(
                    rng.randint(2**31),
                    shape=hw,
                    n=rng.randint(2, 11),
                    holes=rng.rand() < 0.7,
                )
            )
    got_f = F.fuse_masks(masks)
    want_f = oracle.model_confuse(masks)
    if not np.array_equal(got_f, want_f):
        raise AssertionError(f"fusion diverged at seed {seed}")
    got_p, got_h = E.extract_polygons(want_f)
    want_p, want_h = oracle.detection_points(want_f)
    if got_h != want_h or len(got_p) != len(want_p):
        raise AssertionError(f"polygons diverged at seed {seed}")
    for g, w in zip(got_p, want_p):
        ga = np.array(g, np.float64)
        wa = np.array(w, np.float64)
        if ga.shape != wa.shape:
            raise AssertionError(f"polygons diverged at seed {seed}")
        # approxPolyDP rings are int and must be EXACT.  minAreaRect-fallback
        # rings are float32: bit-exact in the overwhelming majority (round 3:
        # cv2-ordered hull + f32 rotating calipers + cv2 angle normalisation),
        # but on exact-area caliper ties cv2's compiled binary can pick a
        # different winning support sequence (instruction-scheduling/FMA
        # dependent — cv2's own output varies across its SSE/AVX2 builds), so
        # those rare rings are accepted to TIE_MAX_ULP f32 ulps per
        # coordinate (a <=1-ulp center/size difference propagates as an
        # absolute offset, i.e. more ulps at smaller-exponent coordinates),
        # counted, and BOUNDED in main() (first seen: seed 44766,
        # 1-in-45k through this fuzz; docs/QUIRKS.md).
        if np.array_equal(ga, wa):
            continue
        if not float_ring_tie_ok(ga, wa):
            raise AssertionError(f"polygons diverged at seed {seed}")
        ULP_CASES.append(seed)


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    t0 = time.time()
    for i in range(iters):
        one_iteration(base + i)
        if (i + 1) % 200 == 0:
            print(
                f"{i + 1}/{iters} ok ({time.time() - t0:.0f}s)", flush=True
            )
    # ties are singular events (measured ~1 in 45k): a systematic sub-4-ulp
    # drift in the calipers must still FAIL, not hide in the allowance
    budget = max(2, iters // 1000)
    if len(ULP_CASES) > budget:
        print(
            f"PARITY FUZZ FAIL: {len(ULP_CASES)} ulp-level ring divergences "
            f"(> tie budget {budget}) at seeds {ULP_CASES[:20]} — this is a "
            f"systematic calipers regression, not cv2 tie noise"
        )
        return 1
    print(
        f"PARITY FUZZ OK: {iters} iterations (seeds {base}..{base + iters - 1}), "
        f"fusion pixel-exact; int rings bit-exact; float rings bit-exact except "
        f"{len(ULP_CASES)} <={TIE_MAX_ULP}-ulp caliper-tie case(s) {ULP_CASES[:10]}, "
        f"{time.time() - t0:.0f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
