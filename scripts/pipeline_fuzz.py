"""Randomized end-to-end GLUE fuzz: full Pipeline vs an independent
re-enactment of the reference pipeline.

The other two parity harnesses pin the ends of the spectrum:
``scripts/fuzz_parity.py`` fuzzes fusion + polygon extraction on synthetic
masks, and ``scripts/tf_e2e_parity.py`` runs the real zoo under real
tf_keras on two scenes.  This one fuzzes everything in between — the GLUE:

* scene shapes (square / wide / tall / single-tile / degenerate),
* multi-scene batches through ``Pipeline.predict_images`` (scene grouping,
  group splitting, fetch-order pipelining),
* ``bucket_sizes`` mode (shared program shapes, runtime extents),
* the blocked huge-scene path (tiny ``max_scene_tiles`` so ordinary scenes
  decompose into blocks),
* bug-mode non-square tiling (``fix_nonsquare_bug=False``,
  `/root/reference/predict.py:106`) — wide scenes compare the replicated
  under-tiled masks; tall scenes assert the faithful ValueError (the real
  reference crashes on the truncated tiles its overrun produces),

each iteration drawing a random configuration and asserting per-model
masks, the fused mask and the corner points EXACT against a literal numpy
re-enactment of `predict.py:90-116` + the cv2 transcription of
`model_fuse.py`/`edge_3.py` (tests/reference_oracle.py) with shared tiny
models.  CPU f32 convs are batch-shape-invariant bitwise, so ANY mismatch
is a glue bug, not float noise (the same exactness the in-suite engine
tests rely on).

Usage: python scripts/pipeline_fuzz.py [iters] [base_seed]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import reference_oracle as RO  # noqa: E402  (cv2 transcription; test oracle)

from building_detection_tpu.core import module as M  # noqa: E402
from building_detection_tpu.core.config import Config, TilerConfig  # noqa: E402
from building_detection_tpu.infer.pipeline import Pipeline  # noqa: E402
from building_detection_tpu.models import registry  # noqa: E402
from building_detection_tpu.nn import layers as L  # noqa: E402
from building_detection_tpu.train.checkpoint import save_variables  # noqa: E402
from building_detection_tpu.utils.io import points_dict  # noqa: E402

CFG = TilerConfig(tile=32, stride=24, overlap=8)


def tiny_fn(s, x):
    x = L.conv2d(s, x, 8, 3, strides=2, activation="relu")
    x = L.conv2d_transpose(s, x, 8, 2, strides=2, activation="relu")
    return L.conv2d(s, x, 2, 3, activation="softmax")


def reference_loop(image_rgb, apply_fn, cfg=CFG, fix_nonsquare=True):
    """`predict.py:90-116` in numpy: normalize (f64) -> pad -> slide ->
    per-tile batch-1 forward -> int8 accumulate -> >=1 binarize -> crop.
    ``fix_nonsquare=False`` runs the inner loop over the HEIGHT-derived
    count (the reference bug, `predict.py:106`); callers only pass
    non-overrunning (wide/square) scenes in bug mode — tall scenes crash
    the real reference and raise in our tiler (see ``_bug_overruns``).
    """
    img = image_rgb / 127.5 - 1
    h, w = img.shape[:2]
    # LOOP bounds use the UNCLAMPED padded size (empty for dims <= overlap);
    # the CANVAS clamps to >= tile (`max(new_h, 512)`, predict.py:100-101).
    # The distinction is visible in bug mode: h > overlap, w <= overlap
    # still runs one height-derived tile column on the min-size canvas and
    # yields a NONBLANK mask (seed 170 caught the old blank-out here).
    n_h = max(-(-(h - cfg.overlap) // cfg.stride), 0)
    n_w = max(-(-(w - cfg.overlap) // cfg.stride), 0)
    inner_n = n_w if fix_nonsquare else n_h
    if n_h == 0 or inner_n == 0:
        return np.zeros((h, w), np.uint8)  # empty loop: blank (QUIRKS.md)
    new_h = max(n_h * cfg.stride + cfg.overlap, cfg.tile)
    new_w = max(n_w * cfg.stride + cfg.overlap, cfg.tile)
    tmp = np.zeros((new_h, new_w, 3))
    acc = np.zeros((new_h, new_w), np.int8)
    tmp[:h, :w] = img
    for ii in range(n_h):
        for jj in range(inner_n):
            i, j = ii * cfg.stride, jj * cfg.stride
            part = tmp[i : i + cfg.tile, j : j + cfg.tile][None].astype(np.float32)
            probs = np.asarray(apply_fn(jnp.asarray(part)))[0]
            acc[i : i + cfg.tile, j : j + cfg.tile] += probs.argmax(-1).astype(
                np.int8
            )
    return np.where(acc >= 1, 255, 0).astype(np.uint8)[:h, :w]


def _rings_match_ulp(ours, theirs) -> bool:
    """Fallback ring comparison: int rings must be exact; float
    (minAreaRect-fallback) rings may be a cv2 equal-area caliper-tie case
    — one shared policy with the fusion/polygon fuzz
    (``fuzz_parity.float_ring_tie_ok``, <=TIE_MAX_ULP ulps/coordinate;
    docs/QUIRKS.md; first seen at fuzz_parity seed 44766)."""
    from fuzz_parity import float_ring_tie_ok

    if len(ours) != len(theirs):
        return False
    for (ox, oy), (tx, ty) in zip(ours, theirs):
        ga = np.array([ox, oy], np.float64)
        wa = np.array([tx, ty], np.float64)
        if ga.shape != wa.shape:
            return False
        if np.array_equal(ga, wa):
            continue
        if not float_ring_tie_ok(ga, wa):
            return False
    return True


def _bug_overruns(h: int, w: int, cfg=CFG) -> bool:
    """True when bug-mode tiling of an (h, w) scene overruns the canvas
    width (tall scenes): the reference feeds the model TRUNCATED tiles and
    crashes (decoder shape mismatch, verified under real tf_keras); our
    plan_tiles raises the faithful ValueError."""
    n_h = max(-(-(h - cfg.overlap) // cfg.stride), 0)
    n_w = max(-(-(w - cfg.overlap) // cfg.stride), 0)
    canvas_w = max(n_w * cfg.stride + cfg.overlap, cfg.tile)
    return bool(n_h) and (n_h - 1) * cfg.stride + cfg.tile > canvas_w


def synthetic_scene(rng, h, w):
    """Blobby imagery so model masks form large regions (areas above the
    fusion thresholds) — pure noise scenes are mixed in by the caller."""
    cell = int(rng.randint(4, 17))
    base = rng.randint(0, 256, (h // cell + 1, w // cell + 1, 3)).astype(np.float32)
    img = np.kron(base, np.ones((cell, cell, 1)))[:h, :w]
    img += rng.randn(h, w, 3) * rng.uniform(0, 12)
    return np.clip(img, 0, 255).astype(np.uint8)


class Harness:
    """Tiny 5-member zoo shared by the Pipeline and the oracle, plus a
    pipeline cache so repeated configurations reuse compiled programs."""

    def __init__(self, weight_dir: str):
        self.names = list(registry.ENSEMBLE_ORDER)
        for name in self.names:
            registry.MODEL_REGISTRY[name] = tiny_fn
        self.weights = {}
        self.apply_fns = {}
        for k, name in enumerate(self.names):
            params, state = M.init(
                tiny_fn,
                jax.random.key(100 + k),
                jax.ShapeDtypeStruct((1, CFG.tile, CFG.tile, 3), jnp.float32),
            )
            path = os.path.join(weight_dir, f"{name}.npz")
            save_variables(path, jax.device_get(params), jax.device_get(state))
            self.weights[name] = path
            self.apply_fns[name] = jax.jit(
                lambda t, fn=tiny_fn, p=params, s=state: M.apply(fn, p, s, t)[0]
            )
        self._pipes = {}

    def pipeline(self, bucket: bool, bug: bool, max_scene_tiles) -> Pipeline:
        key = (bucket, bug, max_scene_tiles)
        if key not in self._pipes:
            cfg = Config(
                tiler=TilerConfig(
                    tile=CFG.tile,
                    stride=CFG.stride,
                    overlap=CFG.overlap,
                    bucket_sizes=bucket,
                    fix_nonsquare_bug=not bug,
                )
            )
            self._pipes[key] = Pipeline(
                weights=self.weights,
                cfg=cfg,
                batch_tiles=12,
                compute_dtype=jnp.float32,
                max_scene_tiles=max_scene_tiles,
            )
        return self._pipes[key]

    def oracle(self, scene: np.ndarray, bug: bool):
        masks = {
            n: reference_loop(scene, self.apply_fns[n], fix_nonsquare=not bug)
            for n in self.names
        }
        fused = RO.model_confuse([masks[n] for n in sorted(self.names)])
        points, _h = RO.detection_points(fused)
        return masks, fused, points

    def one_iteration(self, seed: int) -> None:
        rng = np.random.RandomState(seed)
        bug = rng.rand() < 0.15
        bucket = (not bug) and rng.rand() < 0.3
        blocked = (not bug) and rng.rand() < 0.3
        # tiny block budget so ordinary scenes exercise the blocked path
        max_scene_tiles = int(rng.randint(4, 10)) if blocked else None
        n_scenes = int(rng.randint(1, 5))
        scenes = []
        for _ in range(n_scenes):
            kind = rng.rand()
            if kind < 0.08:  # degenerate (<= overlap in one dim)
                h, w = int(rng.randint(1, CFG.overlap + 1)), int(rng.randint(1, 60))
                if rng.rand() < 0.5:
                    h, w = w, h
            elif kind < 0.4:  # small, single-or-few tiles
                h, w = int(rng.randint(9, 70)), int(rng.randint(9, 70))
            else:  # multi-tile, possibly very non-square
                h, w = int(rng.randint(40, 260)), int(rng.randint(40, 260))
            scenes.append(
                synthetic_scene(rng, h, w)
                if rng.rand() < 0.7
                else rng.randint(0, 256, (h, w, 3), np.uint8)
            )
        pipe = self.pipeline(bucket, bug, max_scene_tiles)
        if bug:
            overruns = [_bug_overruns(*s.shape[:2]) for s in scenes]
            if any(overruns):
                # tall scenes in bug mode must raise the faithful error —
                # and specifically THAT error (any other ValueError from the
                # glue is a bug this harness must not swallow)
                try:
                    pipe.predict_images(scenes)
                except ValueError as e:
                    if "tall scene" not in str(e):
                        raise
                else:
                    raise AssertionError(
                        f"seed={seed}: bug-mode tall scene did not raise"
                    )
                scenes = [s for s, o in zip(scenes, overruns) if not o]
                if not scenes:
                    return
        results = pipe.predict_images(scenes)
        for idx, (scene, res) in enumerate(zip(scenes, results)):
            ref_masks, ref_fused, ref_points = self.oracle(scene, bug)
            ctx = (
                f"seed={seed} scene={idx} hw={scene.shape[:2]} bug={bug} "
                f"bucket={bucket} max_scene_tiles={max_scene_tiles}"
            )
            for n in self.names:
                if not np.array_equal(res.masks[n], ref_masks[n]):
                    diff = int((res.masks[n] != ref_masks[n]).sum())
                    raise AssertionError(f"mask {n} diverged ({diff} px): {ctx}")
            if not np.array_equal(res.fused, ref_fused):
                diff = int((res.fused != ref_fused).sum())
                raise AssertionError(f"fused diverged ({diff} px): {ctx}")
            ours = points_dict(res.corners)
            theirs = {
                str(i): "".join(f"{x},{y} " for x, y in zip(xs, ys))
                for i, (xs, ys) in enumerate(ref_points)
            }
            if ours != theirs and not _rings_match_ulp(res.corners, ref_points):
                raise AssertionError(f"points diverged: {ctx}")


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    with tempfile.TemporaryDirectory() as wd:
        h = Harness(wd)
        t0 = time.time()
        for k in range(iters):
            h.one_iteration(base + k)
            if (k + 1) % 20 == 0:
                rate = (k + 1) / (time.time() - t0)
                print(f"{k + 1}/{iters} ok ({rate:.2f} it/s)", flush=True)
    print(
        f"PIPELINE GLUE FUZZ OK: {iters} iterations "
        f"(seeds {base}..{base + iters - 1}), masks/fused/points exact",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
