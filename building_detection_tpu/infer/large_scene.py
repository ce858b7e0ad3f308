"""Blocked prediction: scenes larger than device memory, bit-exactly.

The engine keeps the whole normalized scene canvas in HBM — O(scene) device
memory.  The reference keeps its canvas in host RAM and runs one tile at a
time on the accelerator (`/root/reference/predict.py:98-116`), so its GPU
memory is O(tile): a 40k x 40k GeoTIFF the reference grinds through would
OOM a 16 GB chip here.  This module restores O(block) device memory without
changing one output bit, by exploiting two structural facts:

* **The tile grid is block-decomposable.**  Origins sit at multiples of
  ``stride`` and a tile spans ``tile <= stride + overlap`` pixels, so a
  block covering ``k`` consecutive origin rows spans exactly
  ``k*stride + overlap`` canvas rows — and ``plan_tiles`` of that slice
  reproduces the global origins shifted by the block offset (the padding
  rule ``new = ceil((dim-overlap)/stride)*stride + overlap``,
  `predict.py:98-102`, telescopes across the cut).  Verified structurally
  by :func:`plan_blocks` per block.
* **The canvas combine is an OR.**  Every output pixel is the OR of the
  tile masks covering it (``+=`` into int8 then ``>= 1``,
  `predict.py:113-114`).  Blocks partition the tile set, so OR-ing block
  canvases into the scene mask reproduces the whole-scene scatter exactly.

Blocks are fed to the ensemble as ordinary scenes: interior blocks all share
one shape, so they group into full dispatches and pipeline through
``predict_masks_iter`` like any scene batch (uploads/downloads overlap
compute).  Bit-equality with the unblocked path is pinned by
``tests/test_large_scene.py``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import numpy as np

from building_detection_tpu.core.config import TilerConfig
from building_detection_tpu.ops import tiling as T


@dataclasses.dataclass(frozen=True)
class Block:
    """One rectangular chunk of the scene's tile grid."""

    r0: int      # image/canvas row offset of the block slice
    c0: int      # image/canvas col offset
    rows: int    # real image rows in the slice (pad is re-derived locally)
    cols: int    # real image cols


def plan_blocks(
    height: int,
    width: int,
    cfg: TilerConfig = TilerConfig(),
    max_block_tiles: int = 128,
) -> Optional[List[Block]]:
    """Partition the scene's tile grid into blocks of <= ``max_block_tiles``.

    Returns ``None`` when blocking is unnecessary (the whole scene already
    fits the budget, or it is degenerate) — callers then use the normal
    path.  Blocks are near-square in tile units so block canvases stay small
    in both dimensions (a full-width strip of a 100k-px-wide scene would
    defeat the point).
    """
    if not cfg.fix_nonsquare_bug:
        # The faithful-bug grid couples the width tile count to the HEIGHT
        # (`predict.py:106`); a block's local plan would re-derive it from
        # the block's height and diverge.  docs/QUIRKS.md: the bug mode
        # exists only for parity archaeology; blocked scenes require the
        # fixed grid.
        raise ValueError(
            "blocked prediction requires fix_nonsquare_bug=True"
        )
    if cfg.tile > cfg.stride + cfg.overlap:
        # tiles would read past the local canvas (the global planner has the
        # same constraint implicitly; the reference's 512 = 360 + 152)
        raise ValueError("blocked prediction requires tile <= stride + overlap")
    _, n_h = T._axis_tiles(height, cfg)
    _, n_w = T._axis_tiles(width, cfg)
    if n_h * n_w <= max_block_tiles or n_h == 0 or n_w == 0:
        return None
    k = max(int(math.isqrt(max_block_tiles)), 1)
    k_w = min(n_w, k)
    k_h = min(n_h, max(max_block_tiles // k_w, 1))
    blocks: List[Block] = []
    for i0 in range(0, n_h, k_h):
        i1 = min(i0 + k_h, n_h) - 1
        r0 = i0 * cfg.stride
        rows = min(i1 * cfg.stride + cfg.tile, height) - r0
        for j0 in range(0, n_w, k_w):
            j1 = min(j0 + k_w, n_w) - 1
            c0 = j0 * cfg.stride
            cols = min(j1 * cfg.stride + cfg.tile, width) - c0
            # the local plan must reproduce the global grid restricted to
            # this block (the decomposition invariant this module rests on)
            _, bn_h = T._axis_tiles(rows, cfg)
            _, bn_w = T._axis_tiles(cols, cfg)
            assert bn_h == i1 - i0 + 1 and bn_w == j1 - j0 + 1, (
                "tile grid not block-decomposable",
                (rows, cols, bn_h, bn_w, i0, i1, j0, j1),
            )
            blocks.append(Block(r0, c0, rows, cols))
    return blocks


def predict_mask_blocked(
    predictor,
    image_rgb: np.ndarray,
    max_block_tiles: int = 128,
    max_in_flight: int = 8,
) -> np.ndarray:
    """Single-model blocked prediction via ``TiledPredictor``.

    Keeps at most ``max_in_flight`` blocks dispatched at once (so device
    memory stays O(max_in_flight * block), which is the whole point of this
    module) while still overlapping later blocks' uploads with earlier
    blocks' compute; fetches and OR-stitches in dispatch order.
    """
    h, w = image_rgb.shape[:2]
    blocks = plan_blocks(h, w, predictor.cfg, max_block_tiles)
    if blocks is None:
        return predictor.predict_mask(image_rgb)
    out = np.zeros((h, w), np.uint8)
    pending: List[tuple] = []

    def _drain_one() -> None:
        b, d = pending.pop(0)
        np.maximum(
            out[b.r0 : b.r0 + b.rows, b.c0 : b.c0 + b.cols],
            predictor.fetch(d),
            out=out[b.r0 : b.r0 + b.rows, b.c0 : b.c0 + b.cols],
        )

    for b in blocks:
        view = image_rgb[b.r0 : b.r0 + b.rows, b.c0 : b.c0 + b.cols]
        pending.append((b, predictor.dispatch(np.ascontiguousarray(view))))
        if len(pending) >= max(int(max_in_flight), 1):
            _drain_one()
    while pending:
        _drain_one()
    return out


def predict_masks_blocked(
    ensemble,
    image_rgb: np.ndarray,
    max_block_tiles: int = 128,
    max_in_flight: int = 8,
) -> Dict[str, np.ndarray]:
    """Ensemble blocked prediction: per-model full-scene {0,255} masks.

    Blocks stream through the ensemble's pipelined scene path
    (``predict_masks_iter``) — same-shape interior blocks group into full
    dispatches — and OR-stitch into the per-model outputs as they land.
    Falls back to ``predict_masks`` when the scene fits the budget.
    """
    h, w = image_rgb.shape[:2]
    cfg = getattr(ensemble, "cfg", None)
    if cfg is None:  # EnsemblePredictor keeps it on its member predictors
        cfg = next(iter(ensemble.predictors.values())).cfg
    blocks = plan_blocks(h, w, cfg, max_block_tiles)
    if blocks is None:
        return ensemble.predict_masks(image_rgb)
    views = [
        np.ascontiguousarray(
            image_rgb[b.r0 : b.r0 + b.rows, b.c0 : b.c0 + b.cols]
        )
        for b in blocks
    ]
    names = getattr(ensemble, "names", None) or list(
        getattr(ensemble, "predictors", {})
    )
    out = {name: np.zeros((h, w), np.uint8) for name in names}
    if hasattr(ensemble, "predict_masks_iter"):
        it = ensemble.predict_masks_iter(views, max_in_flight=max_in_flight)
    else:  # EnsemblePredictor: per-block dict, sequential
        it = ((i, ensemble.predict_masks(v)) for i, v in enumerate(views))
    for idx, masks in it:
        b = blocks[idx]
        for name, m in masks.items():
            region = out[name][b.r0 : b.r0 + b.rows, b.c0 : b.c0 + b.cols]
            np.maximum(region, m, out=region)
    return out
