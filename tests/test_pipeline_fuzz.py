"""In-suite slice of the end-to-end GLUE fuzz (scripts/pipeline_fuzz.py).

Runs a handful of fixed seeds of the randomized Pipeline-vs-reference
re-enactment so the glue coverage (multi-scene batching, scene grouping,
bucketing, blocked scenes, bug mode, degenerate shapes) is exercised on
every suite run.  Seeds 9 and 22 are pinned deliberately: each caught a
real bug when the fuzz was first written —

* seed 9: bug-mode TALL scene — the reference's overrunning inner loop
  (`predict.py:106`) feeds the model truncated tiles and crashes; our
  tiler used to clamp origins silently, now raises the faithful error;
* seed 22: f32 normalization diverged 1 ulp from the reference's
  numpy-f64-then-cast semantics for half the uint8 range, flipping a
  near-tie argmax pixel; normalize() now reproduces it exactly (Newton
  reciprocal correction, see ops/tiling.py);
* seed 170: bug-mode scene with h > overlap but w <= overlap — the
  reference's loop bounds use the UNCLAMPED padded size while its canvas
  clamps to the tile size, so one height-derived tile still runs and the
  mask is NONBLANK; the fuzz oracle (not the engine) blanked it out.

The long-run sweep (hundreds of seeds) stays in scripts/; this keeps the
suite time bounded.
"""
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts")
)

import pipeline_fuzz  # noqa: E402


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    # Harness swaps the zoo entries in MODEL_REGISTRY for tiny models;
    # snapshot and restore so later test modules see the real zoo.  The
    # restore must run even if Harness.__init__ raises midway (it mutates
    # the registry BEFORE anything can fail), so try/finally around the
    # yield is not enough — the construction itself sits inside the try.
    from building_detection_tpu.models import registry

    saved = dict(registry.MODEL_REGISTRY)
    try:
        wd = tmp_path_factory.mktemp("fuzz_weights")
        yield pipeline_fuzz.Harness(str(wd))
    finally:
        registry.MODEL_REGISTRY.clear()
        registry.MODEL_REGISTRY.update(saved)


@pytest.mark.parametrize("seed", [9, 22, 170, 0])
def test_glue_fuzz_seed(harness, seed):
    harness.one_iteration(seed)
