"""Memory-safety and thread-safety checks for the native geometry library.

The reference offloads mask geometry to OpenCV's compiled C++ and ships no
sanitizer or race-detection story (SURVEY.md §5: none).  The rebuild's native
library gets both:

* ``make -C native sanitize`` runs ``native/src/fuzz_driver.cc`` — every
  exported entry point over adversarial masks under ASan+UBSan (leak
  detection on, recover off), with differential checks against naive
  reimplementations.  This module runs a bounded slice of it in-suite.
* ctypes releases the GIL around every native call and the library is
  stateless by design (no globals; scratch buffers are stack-local) — the
  concurrency test here pins that: many threads hammering the same entry
  points must reproduce the serial results bit-exactly.
"""
import os
import shutil
import subprocess
import threading

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")


def _asan_available() -> bool:
    if shutil.which("g++") is None:
        return False
    probe = subprocess.run(
        ["g++", "-fsanitize=address,undefined", "-x", "c++", "-", "-o",
         os.devnull],
        input=b"int main(){return 0;}",
        capture_output=True,
    )
    return probe.returncode == 0


@pytest.mark.skipif(not _asan_available(), reason="g++ ASan runtime missing")
def test_sanitized_fuzz_driver_is_clean():
    # Small in-suite slice; the default (400 rounds) runs via `make -C
    # native sanitize`.  The driver aborts on any sanitizer report or
    # invariant violation, so returncode is the whole assertion.
    result = subprocess.run(
        ["make", "-C", NATIVE_DIR, "sanitize", "FUZZ_ITERS=60"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stdout + result.stderr


def test_native_calls_are_thread_safe():
    _native = pytest.importorskip("building_detection_tpu.post._native")

    rng = np.random.default_rng(20260819)
    masks = [
        (rng.random((h, w)) < p).astype(np.uint8) * 255
        for h, w, p in [(64, 64, 0.4), (48, 96, 0.7), (96, 48, 0.15),
                        (33, 33, 0.55), (64, 64, 0.9), (1, 64, 0.5)]
    ]

    def run_all(mask):
        filled = _native.fill_holes(mask)
        contours = _native.find_contours(mask)
        eroded = _native.erode(mask, (1, 5), iterations=5)
        dilated = _native.dilate(mask, (7, 1), iterations=1)
        processed = _native.process_mask(mask, 10.0, 3, 1, 4.0)
        return filled, contours, eroded, dilated, processed

    serial = [run_all(m) for m in masks]

    results = [[None] * len(masks) for _ in range(8)]
    errors = []

    def worker(tid):
        try:
            for rep in range(4):
                for i, m in enumerate(masks):
                    results[tid][i] = run_all(m)
        except Exception as exc:  # pragma: no cover - failure path
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    for tid in range(8):
        for i in range(len(masks)):
            s, r = serial[i], results[tid][i]
            np.testing.assert_array_equal(s[0], r[0])
            assert len(s[1]) == len(r[1])
            for cs, cr in zip(s[1], r[1]):
                np.testing.assert_array_equal(cs, cr)
            np.testing.assert_array_equal(s[2], r[2])
            np.testing.assert_array_equal(s[3], r[3])
            np.testing.assert_array_equal(s[4], r[4])
