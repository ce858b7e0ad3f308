"""Full prediction pipeline: image -> 5 masks -> fused mask -> polygons.

The reference pipeline (`/root/reference/predict.py:135-181`) moves data
between stages through PNG files on disk; here arrays flow in memory and
files appear only where the CLI/serving contracts require them
(per-model masks, ``{name}_result.png``, ``{name}.txt``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import Config
from building_detection_tpu.infer.engine import EnsemblePredictor
from building_detection_tpu.ops import tiling as T
from building_detection_tpu.models.registry import (
    ENSEMBLE_ORDER,
    MODEL_REGISTRY,
    init_model,
)
from building_detection_tpu.post import edges as E
from building_detection_tpu.post import fusion as F
from building_detection_tpu.train.checkpoint import load_variables
from building_detection_tpu.utils import io as uio
from building_detection_tpu.utils.profiling import StageTimer


def _calibration_tiles(
    scenes: List[np.ndarray], cfg: Config, max_tiles: int
) -> np.ndarray:
    """Host-side: (N, tile, tile, 3) uint8 calibration tiles cut from RGB
    scenes with the inference tiler geometry (`predict.py:98-106`)."""
    tile = cfg.tiler.tile
    out: List[np.ndarray] = []
    for img in scenes:
        h, w = img.shape[:2]
        plan = T.plan_tiles(h, w, cfg.tiler)
        canvas = np.zeros((plan.canvas_h, plan.canvas_w, 3), np.uint8)
        canvas[:h, :w] = img
        for oy, ox in np.asarray(T.origins_array(plan)):
            out.append(canvas[oy : oy + tile, ox : ox + tile])
            if len(out) >= max_tiles:
                return np.stack(out)
    if not out:
        raise ValueError("int8 calibration needs at least one scene")
    return np.stack(out)


def calibrate_members_int8(
    members: Dict[str, tuple],
    scenes: List[np.ndarray],
    cfg: Config = Config(),
    compute_dtype=jnp.bfloat16,
    int8_pointwise=True,
    max_tiles: int = 32,
    chunk: int = 8,
) -> Dict[str, Dict[str, float]]:
    """Per-member int8 activation calibration over representative scenes.

    Returns ``{model name -> {site -> amax}}`` for the predictors'
    ``int8_scales``.  Tiles are cut and normalized exactly as inference
    does; ``int8_pointwise`` must match the inference flag so the
    calibrated sites are the active ones.  One fixed ``chunk`` shape keeps
    it to a single compile per member.
    """
    tiles = _calibration_tiles(scenes, cfg, max_tiles)
    n = tiles.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        tiles = np.concatenate([tiles, tiles[:pad]], axis=0)
    batches = [tiles[i : i + chunk] for i in range(0, tiles.shape[0], chunk)]
    scales: Dict[str, Dict[str, float]] = {}
    for name, (fn, params, state) in members.items():
        def fn_u8(scope, xu8, _fn=fn):
            return _fn(scope, T.normalize(xu8, cfg.tiler, dtype=compute_dtype))

        scales[name] = M.calibrate_int8(
            fn_u8,
            params,
            state,
            batches,
            int8_pointwise=int8_pointwise,
            compute_dtype=compute_dtype,
        )
    return scales


def save_int8_scales(path: str, scales: Dict[str, Dict[str, float]]) -> None:
    """Persist calibration scales as JSON (calibrate once, serve forever)."""
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_int8_scales(path: str) -> Dict[str, Dict[str, float]]:
    import json

    with open(path) as f:
        scales = json.load(f)
    return {
        m: {site: float(v) for site, v in d.items()} for m, d in scales.items()
    }


def discover_weights(weights_dir: str) -> Dict[str, str]:
    """Find per-model checkpoints in a directory.

    Accepts our ``{name}.npz`` checkpoints, ``{name}.h5``, and the reference
    deployment's own filenames verbatim (`predict.py:17-54`: ``resnet34.h5``
    for res34, ``deep.h5`` for v3plus, ``hrnet/scse/bam.h5``) so a reference
    user can point ``--weights-dir`` at their existing weight folder and get
    a drop-in run.  First match per model wins (npz preferred).
    """
    aliases = {
        "res34": ("res34", "resnet34"),
        "v3plus": ("v3plus", "deep"),
    }
    found: Dict[str, str] = {}
    for name in ENSEMBLE_ORDER:
        candidates = [f"{name}.npz"]
        for stem in aliases.get(name, (name,)):
            candidates += [f"{stem}.h5", f"{stem}.hdf5"]
        for fname in candidates:
            path = os.path.join(weights_dir, fname)
            if os.path.exists(path):
                found[name] = path
                break
    return found


@dataclasses.dataclass
class PredictResult:
    masks: Dict[str, np.ndarray]  # per-model {0,255} masks
    fused: np.ndarray             # fused {0,255} mask
    corners: List[List[list]]     # closed polygon rings [[xs, ys], ...]
    height: int


class Pipeline:
    """End-to-end detector with all five models resident on device.

    ``weights`` maps model name -> checkpoint path: ``.npz`` from
    :mod:`building_detection_tpu.train.checkpoint`, or a reference-format
    Keras ``.h5`` (imported strictly; see ``import_h5_weights``).  Missing
    entries fall
    back to randomly initialised weights (useful for shape/throughput work,
    and mirrors the reference's swallow-the-load-error behaviour,
    `predict.py:17-54` — except we *say* so loudly).
    """

    def __init__(
        self,
        weights: Optional[Dict[str, str]] = None,
        cfg: Config = Config(),
        batch_tiles: int = 128,
        compute_dtype=jnp.bfloat16,
        models: tuple = ENSEMBLE_ORDER,
        seed: int = 0,
        fused: bool = True,
        mesh=None,
        h5_strict: bool = True,
        int8_pointwise: bool = False,
        int8_calibration: Optional[List[np.ndarray]] = None,
        int8_scales: Optional[Dict[str, Dict[str, float]]] = None,
        max_scene_tiles: Optional[int] = 1024,
    ):
        """``fused=True`` traces the whole ensemble into one XLA program per
        scene shape (bit-identical to per-model execution, fewer dispatches,
        shared tile gather); ``mesh`` shards tile batches over its data axis.

        ``batch_tiles=128`` saturates the v5e MXU (clean on-device profiles,
        bench r2: the ensemble forward runs 47.6 tiles/s at batch 36 but
        74.5 at batch 128 — the 512x512x64 stem convs lay out with batch as
        the MXU lane dimension, so smaller batches underfill the array).
        Single scenes smaller than the budget still run at their own tile
        count; ``predict_images`` groups same-shape scenes to fill it.

        ``int8_pointwise`` (bool or min-input-channel int) opts into int8
        MXU pointwise convs — faster Xception members, NOT mask-parity
        (docs/ARCHITECTURE.md round 3).  Production use should supply
        either ``int8_scales`` (from :func:`load_int8_scales`) or
        ``int8_calibration`` (representative RGB scenes, calibrated here
        at startup); without both, sites fall back to dynamic per-call
        activation scales (numerically safe, measured slower).

        ``max_scene_tiles``: scenes whose tile grid exceeds this run through
        the blocked path (`infer/large_scene.py`) — device memory O(block)
        instead of O(scene), bit-identical output — with blocks sized to
        ``batch_tiles`` so each block still fills a dispatch.  The default
        (1024 tiles ~ an 11.8k x 11.8k scene) never triggers on normal
        scenes; ``None`` disables auto-blocking.  Requires the default
        ``fix_nonsquare_bug=True`` grid (big scenes raise in bug mode rather
        than silently mis-tile)."""
        self.cfg = cfg
        self.batch_tiles = batch_tiles
        self.max_scene_tiles = max_scene_tiles
        weights = weights or {}
        members = {}
        for i, name in enumerate(models):
            fn = MODEL_REGISTRY[name]
            if name in weights:
                path = weights[name]
                if path.endswith((".h5", ".hdf5")):
                    # reference-format Keras checkpoint (predict.py:17-54);
                    # strict: a half-matched import raises instead of
                    # silently predicting from leftover random init
                    from building_detection_tpu.train.checkpoint import (
                        import_h5_weights,
                    )

                    params, state = init_model(
                        name,
                        jax.random.key(seed + i),
                        (1, cfg.tiler.tile, cfg.tiler.tile, 3),
                    )
                    params, state, report = import_h5_weights(
                        path, params, state, strict=h5_strict
                    )
                    print(f"[pipeline] {name}: {report.summary()}")
                else:
                    params, state, _, _, _ = load_variables(path)
                params = {k: jnp.asarray(v) for k, v in params.items()}
                state = {k: jnp.asarray(v) for k, v in state.items()}
            else:
                print(
                    f"[pipeline] no weights for {name!r}: using random init"
                )
                params, state = init_model(
                    name, jax.random.key(seed + i), (1, cfg.tiler.tile, cfg.tiler.tile, 3)
                )
            members[name] = (fn, params, state)
        if int8_pointwise and int8_scales is None and int8_calibration:
            # One pass over representative scenes collects per-site
            # activation amax; static scales then bake into the inference
            # program as constants, keeping the quantize fusable (the
            # dynamic per-call max measured slower than bf16 end-to-end —
            # docs/ARCHITECTURE.md round 3).
            int8_scales = calibrate_members_int8(
                members,
                int8_calibration,
                cfg=cfg,
                compute_dtype=compute_dtype,
                int8_pointwise=int8_pointwise,
            )
        # kept for save_int8_scales (calibrate once, serve with the file)
        self.int8_scales = int8_scales
        if fused:
            from building_detection_tpu.infer.fused_ensemble import (
                FusedEnsemblePredictor,
            )

            self.ensemble = FusedEnsemblePredictor(
                members, cfg.tiler, batch_tiles, compute_dtype, mesh=mesh,
                int8_pointwise=int8_pointwise, int8_scales=int8_scales,
            )
        else:
            self.ensemble = EnsemblePredictor(
                members, cfg.tiler, batch_tiles, compute_dtype,
                int8_pointwise=int8_pointwise, int8_scales=int8_scales,
            )
        self.timer = StageTimer()

    def _needs_blocking(self, image_rgb: np.ndarray) -> bool:
        if self.max_scene_tiles is None:
            return False
        _, n_h = T._axis_tiles(image_rgb.shape[0], self.cfg.tiler)
        _, n_w = T._axis_tiles(image_rgb.shape[1], self.cfg.tiler)
        if not self.cfg.tiler.fix_nonsquare_bug:
            n_w = n_h
        return n_h * n_w > self.max_scene_tiles

    def _predict_masks(self, image_rgb: np.ndarray) -> Dict[str, np.ndarray]:
        if self._needs_blocking(image_rgb):
            from building_detection_tpu.infer.large_scene import (
                predict_masks_blocked,
            )

            return predict_masks_blocked(
                self.ensemble, image_rgb, max_block_tiles=self.batch_tiles
            )
        return self.ensemble.predict_masks(image_rgb)

    def predict_image(self, image_rgb: np.ndarray) -> PredictResult:
        """RGB array in, polygons out; nothing touches the filesystem.

        Per-stage wall-clock accumulates in ``self.timer``
        (``pipe.timer.report()``).
        """
        with self.timer.stage("ensemble_forward"):
            masks = self._predict_masks(image_rgb)
        # The reference fuses masks in glob (alphabetical) order
        # (`model_fuse.py:278`); the vote is order-invariant, so any order
        # yields the same fused mask.
        with self.timer.stage("fusion"):
            fused = F.fuse_masks([masks[k] for k in sorted(masks)], self.cfg.fuse)
        with self.timer.stage("polygons"):
            corners, height = E.extract_polygons(fused, self.cfg.edge)
        return PredictResult(masks, fused, corners, height)

    def predict_images(self, images: List[np.ndarray]) -> List[PredictResult]:
        """Batch prediction: device work for all scenes is pipelined (uploads
        and downloads overlap compute), and host post-processing of each
        fetched scene overlaps the remaining scenes' device compute
        (``predict_masks_iter`` keeps a window of dispatched groups ahead of
        the fetch point).

        Post-processing stays SEQUENTIAL by design.  Round 2 measured a
        thread pool 4-7x SLOWER per call (the NumPy fusion path convoyed on
        the GIL); round 3 moved the fusion morphology into the native C++
        library (300x+ on dense scenes, GIL released during the call) and
        re-measured a pool at 0.96x on this single-hardware-thread box —
        sequential post, overlapped with the remaining groups' device
        compute, remains the measured optimum (BASELINE.md)."""
        def post(masks) -> PredictResult:
            with self.timer.stage("fusion"):
                fused = F.fuse_masks(
                    [masks[k] for k in sorted(masks)], self.cfg.fuse
                )
            with self.timer.stage("polygons"):
                corners, height = E.extract_polygons(fused, self.cfg.edge)
            return PredictResult(masks, fused, corners, height)

        results: List[Optional[PredictResult]] = [None] * len(images)
        # over-budget scenes take the blocked path one at a time (each is
        # internally pipelined over its blocks); the rest batch as usual
        big = [i for i, img in enumerate(images) if self._needs_blocking(img)]
        if big:
            big_set = set(big)
            small_idx = [i for i in range(len(images)) if i not in big_set]
            small = self.predict_images([images[i] for i in small_idx])
            for i, r in zip(small_idx, small):
                results[i] = r
            for i in big:
                with self.timer.stage("ensemble_forward"):
                    masks = self._predict_masks(images[i])
                results[i] = post(masks)
            return results
        if hasattr(self.ensemble, "predict_masks_iter"):
            with self.timer.stage("ensemble_forward"):
                it = self.ensemble.predict_masks_iter(images)
            while True:
                # device dispatch/wait/fetch accrues to ensemble_forward;
                # per-scene post-processing to its own stages
                with self.timer.stage("ensemble_forward"):
                    try:
                        idx, masks = next(it)
                    except StopIteration:
                        break
                results[idx] = post(masks)
        elif hasattr(self.ensemble, "predict_masks_many"):
            with self.timer.stage("ensemble_forward"):
                all_masks = self.ensemble.predict_masks_many(images)
            results = [post(m) for m in all_masks]
        else:
            results = [
                post(self.ensemble.predict_masks(img)) for img in images
            ]
        return results

    def predict_file(
        self,
        img_path: str,
        out_dir: str,
        name: Optional[str] = None,
        keep_intermediates: bool = False,
    ) -> PredictResult:
        """File-in / files-out contract of `predict.py:141-178`.

        Writes ``{model}_{name}.png`` per model (deleted afterwards unless
        ``keep_intermediates``, like `predict.py:174-178`),
        ``{name}_result.png`` and ``{name}.txt``.
        """
        if name is None:
            name = os.path.splitext(os.path.basename(img_path))[0]
        os.makedirs(out_dir, exist_ok=True)
        image = uio.imread_rgb(img_path)
        result = self.predict_image(image)
        if keep_intermediates:
            for model_name, mask in result.masks.items():
                uio.imwrite(
                    os.path.join(out_dir, f"{model_name}_{name}.png"), mask
                )
        uio.imwrite(os.path.join(out_dir, f"{name}_result.png"), result.fused)
        uio.write_points(result.corners, os.path.join(out_dir, f"{name}.txt"))
        return result
