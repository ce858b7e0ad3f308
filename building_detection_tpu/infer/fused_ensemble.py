"""Fused ensemble: all five models in ONE jitted program per scene shape.

The reference runs the ensemble as five sequential per-tile predict loops
(`/root/reference/predict.py:78-87`).  :class:`~building_detection_tpu.infer.
engine.EnsemblePredictor` already batches tiles per model; this variant goes
further and traces the whole ensemble into a single XLA program:

* tiles are gathered and normalised ONCE and shared by all five models;
* one dispatch per scene GROUP instead of five per scene (dispatch through
  this environment's TPU tunnel is expensive);
* XLA schedules the five models' ops together, filling pipeline bubbles;
* the 3-of-5 vote (`model_fuse.py:315-323`) is available on device for the
  fast path (``predict_vote``), while per-model masks remain available for
  the parity path's morphological fusion.

Two throughput levers measured on v5e (bench r2, clean on-device timing):

* **tile batch size**: the ensemble forward runs at 47.6 tiles/s at batch 36
  but 72.4 at batch 108 and 74.5 at batch 128 (50%+ MFU) — the 512x512x64
  stem convs lay out with batch as the MXU lane dimension, so batches below
  128 underfill the systolic array.  Scenes smaller than the tile budget are
  therefore *grouped*: ``predict_masks_many`` stacks same-shape scenes on a
  leading scene axis and tiles of the whole group form one batch.
* **download packing**: masks leave the chip as 8-pixels-per-byte bitplanes
  (one per member) instead of one byte per pixel — 0.625 B/px instead of
  1 B/px through the ~30 MB/s tunnel.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import TilerConfig
from building_detection_tpu.ops import tiling as T

Array = jax.Array


def _pack_bitplanes(canvas: Array, n_bits: int) -> Array:
    """(S, H, W) uint8 with one mask bit per member -> (n_bits, S, H, ceil(W/8))
    uint8 bitplanes, MSB-first within each byte (``np.unpackbits`` order)."""
    s, h, w = canvas.shape
    w8 = -(-w // 8) * 8
    if w8 != w:
        canvas = jnp.pad(canvas, ((0, 0), (0, 0), (0, w8 - w)))
    grouped = canvas.reshape(s, h, w8 // 8, 8)
    planes = []
    for bit in range(n_bits):
        plane = (grouped >> bit) & jnp.uint8(1)
        packed = jnp.zeros(grouped.shape[:-1], jnp.uint8)
        for k in range(8):
            packed = packed | (plane[..., k] << (7 - k))
        planes.append(packed)
    return jnp.stack(planes)


def _unpack_bitplanes(planes: np.ndarray, width: int) -> np.ndarray:
    """(n_bits, S, H, W8/8) uint8 -> (n_bits, S, H, width) {0,1} uint8."""
    return np.unpackbits(planes, axis=-1)[..., :width]


class FusedEnsemblePredictor:
    """Drop-in alternative to EnsemblePredictor with one program per scene
    group.  ``batch_tiles`` is the per-dispatch tile budget; same-shape scenes
    are grouped so ``num_tiles * group`` fills it (128 saturates the v5e MXU;
    see module docstring)."""

    def __init__(
        self,
        members: Dict[str, Tuple[Callable, dict, dict]],
        cfg: TilerConfig = TilerConfig(),
        batch_tiles: int = 128,
        compute_dtype=jnp.bfloat16,
        mesh=None,
        int8_pointwise: bool = False,
        int8_scales: Optional[Dict[str, dict]] = None,
    ):
        self.names = list(members)
        self.fns = {n: members[n][0] for n in self.names}
        self.params = {n: members[n][1] for n in self.names}
        self.states = {n: members[n][2] for n in self.names}
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # Deliberate composition decision (docs/ARCHITECTURE.md): the
            # fused program shards TILES over the data axis only.  Channel TP
            # across the five members does not compose — their channel
            # structures differ (728-ch Xception vs 1024-ch UNet vs 32..256
            # HRNet branches), so one model axis cannot partition them
            # evenly and GSPMD would insert halo collectives per member for
            # no win; tile DP already scales the fused path linearly.  For
            # channel TP use per-member TiledPredictor(tp=True).
            raise ValueError(
                "FusedEnsemblePredictor supports data-axis sharding only; "
                "got a mesh with model axis > 1. Use a data-only mesh, or "
                "per-member TiledPredictor(tp=True) for channel TP."
            )
        n_dev = 1 if mesh is None else mesh.devices.size
        self.batch_tiles = batch_tiles * n_dev
        self.compute_dtype = compute_dtype
        # opt-in int8 MXU pointwise convs (docs/ARCHITECTURE.md round-3
        # probes): faster on the Xception members, NOT mask-parity
        self.int8_pointwise = int8_pointwise
        # {model name -> {site -> amax}} from core.module.calibrate_int8;
        # static scales bake into the fused program as constants and keep
        # the quantize fusable (the dynamic fallback measured slower)
        self.int8_scales = int8_scales or {}
        if mesh is not None:
            from building_detection_tpu.parallel import mesh as pmesh

            self.params = pmesh.replicate(self.params, mesh)
            self.states = pmesh.replicate(self.states, mesh)

    @functools.lru_cache(maxsize=32)
    def _compiled(
        self,
        h: int,
        w: int,
        canvas_h: int,
        canvas_w: int,
        num_tiles: int,
        n_scenes: int,
    ):
        cfg = self.cfg
        tile = cfg.tile
        total = num_tiles * n_scenes
        batch = min(self.batch_tiles, max(total, 1))
        num_chunks = -(-total // batch)
        padded = num_chunks * batch
        runtime_hw = h == 0 and w == 0

        def run(params, states, imgs_u8: Array, origins: Array, hw: Array) -> Array:
            # Pad region is forced to 0.0 in normalized space (reference
            # contract, predict.py:102-104).  With bucketing (h == w == 0)
            # images arrive host-padded and the real extents are runtime
            # scalars; otherwise the raw images pad on device (cheaper
            # uploads through the slow tunnel).
            norm = T.normalize(imgs_u8, cfg, dtype=self.compute_dtype)
            if runtime_hw:
                row = lax.broadcasted_iota(jnp.int32, (canvas_h, canvas_w), 0)
                col = lax.broadcasted_iota(jnp.int32, (canvas_h, canvas_w), 1)
                keep = (row[None] < hw[:, 0, None, None]) & (
                    col[None] < hw[:, 1, None, None]
                )
                canvas = jnp.where(keep[..., None], norm, 0)
            else:
                canvas = jnp.pad(
                    norm,
                    ((0, 0), (0, canvas_h - h), (0, canvas_w - w), (0, 0)),
                )
            # scene-indexed origins (scene, row, col), one row per tile
            sidx = jnp.repeat(jnp.arange(n_scenes, dtype=jnp.int32), num_tiles)
            so = jnp.concatenate(
                [sidx[:, None], jnp.tile(origins, (n_scenes, 1))], axis=1
            )
            if padded != total:
                reps = jnp.broadcast_to(so[-1:], (padded - total, 3))
                so = jnp.concatenate([so, reps], axis=0)
            chunks = so.reshape(num_chunks, batch, 3)
            mask_canvas = jnp.zeros((n_scenes, canvas_h, canvas_w), jnp.uint8)

            def body(carry, chunk_origins):
                def get(o):
                    t = lax.dynamic_slice(
                        canvas, (o[0], o[1], o[2], 0), (1, tile, tile, 3)
                    )
                    return t[0]

                tiles = jax.vmap(get)(chunk_origins)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    tiles = lax.with_sharding_constraint(
                        tiles,
                        NamedSharding(self.mesh, P("data", None, None, None)),
                    )
                # the 5 per-model bits are PACKED into one uint8 plane
                packed = jnp.zeros(tiles.shape[:3], jnp.uint8)
                for bit, name in enumerate(self.names):
                    probs, _ = M.apply(
                        self.fns[name],
                        params[name],
                        states[name],
                        tiles,
                        compute_dtype=self.compute_dtype,
                        int8_pointwise=self.int8_pointwise,
                        int8_scales=self.int8_scales.get(name),
                    )
                    m = (jnp.argmax(probs, axis=-1) == 1).astype(jnp.uint8)
                    packed = packed | (m << bit)

                def put(c, i):
                    o = chunk_origins[i]
                    cur = lax.dynamic_slice(
                        c, (o[0], o[1], o[2]), (1, tile, tile)
                    )
                    # per-bit OR over overlapping tiles == the reference's
                    # accumulate-then->=1 per model (predict.py:113-114)
                    return (
                        lax.dynamic_update_slice(
                            c, cur | packed[i][None], (o[0], o[1], o[2])
                        ),
                        None,
                    )

                carry, _ = lax.scan(put, carry, jnp.arange(batch))
                return carry, None

            mask_canvas, _ = lax.scan(body, mask_canvas, chunks)
            if not runtime_hw:
                # crop the pad margin ON DEVICE: the host fetch is the
                # pipeline's down-link bottleneck, don't ship pad bytes
                mask_canvas = mask_canvas[:, :h, :w]
            # ship 8 pixels per byte: bitplane packing cuts the download to
            # 0.625 B/px (5 members) through the ~30 MB/s tunnel
            return _pack_bitplanes(mask_canvas, len(self.names))

        return jax.jit(run)

    # -- staging -----------------------------------------------------------
    def _stage_group(self, images: List[np.ndarray], plan):
        """(compiled_fn, staged device args) for one same-shape scene group."""
        n = len(images)
        if self.cfg.bucket_sizes:
            fn = self._compiled(
                0, 0, plan.canvas_h, plan.canvas_w, plan.num_tiles, n
            )
            staged = np.zeros((n, plan.canvas_h, plan.canvas_w, 3), np.uint8)
            hw = np.zeros((n, 2), np.int32)
            for i, img in enumerate(images):
                ih, iw = img.shape[:2]
                staged[i, :ih, :iw] = img
                hw[i] = (ih, iw)
        else:
            ih, iw = images[0].shape[:2]
            fn = self._compiled(
                ih, iw, plan.canvas_h, plan.canvas_w, plan.num_tiles, n
            )
            staged = np.stack(images)
            hw = np.broadcast_to(np.array([ih, iw], np.int32), (n, 2))
        return fn, (
            jnp.asarray(staged),
            T.origins_array(plan),
            jnp.asarray(hw),
        )

    def _group_size(self, num_tiles: int) -> int:
        """Scenes per dispatch: fill the tile budget with same-shape scenes."""
        return max(1, self.batch_tiles // max(num_tiles, 1))

    # every group size is one compiled program shape; quantizing to 3-smooth
    # sizes bounds the shape count (a serving batcher would otherwise compile
    # a fresh program for every queue length it ever drains)
    _GROUP_SIZES = (32, 24, 16, 12, 8, 6, 4, 3, 2, 1)

    def _split_group(self, count: int, cap: int) -> List[int]:
        """Split ``count`` same-shape scenes into allowed group sizes <= cap."""
        out: List[int] = []
        while count > 0:
            c = next(g for g in self._GROUP_SIZES if g <= min(count, cap))
            out.append(c)
            count -= c
        return out

    def _plan(self, image_rgb: np.ndarray):
        h, w = image_rgb.shape[:2]
        plan = T.plan_tiles(h, w, self.cfg)
        if plan.num_tiles and self.cfg.bucket_sizes:
            plan = T.bucket_plan(plan, self.cfg)
        return plan

    def _masks_from_planes(self, planes: np.ndarray, sizes) -> list:
        """Unpack fetched bitplanes into per-scene {0,255} mask dicts."""
        width = max(w for _, w in sizes)
        bits = _unpack_bitplanes(planes, min(width, planes.shape[-1] * 8))
        out = []
        for i, (h, w) in enumerate(sizes):
            out.append(
                {
                    name: bits[bit, i, :h, :w] * np.uint8(255)
                    for bit, name in enumerate(self.names)
                }
            )
        return out

    # -- public API ---------------------------------------------------------
    def predict_masks(self, image_rgb: np.ndarray) -> Dict[str, np.ndarray]:
        return self.predict_masks_many([image_rgb])[0]

    def predict_masks_iter(self, images, max_in_flight: int = 8):
        """Dispatch ahead, yield ``(index, masks)`` as fetched.

        Same-shape scenes are grouped to fill ``batch_tiles`` (one dispatch
        per group).  Up to ``max_in_flight`` groups are staged + dispatched
        ahead of the fetch point: the device queue executes FIFO, so later
        groups' uploads and launches overlap earlier groups' compute, while
        the bound keeps queued input canvases from exhausting HBM on huge
        scene batches (each in-flight group holds its staged scenes + packed
        output on device).  Consumers that post-process between ``next()``
        calls (fusion, polygon extraction —
        `infer/pipeline.py::predict_images`) overlap that host work with the
        remaining groups' device compute for free.  Yield order is fetch
        (dispatch) order, not input order — use the index.
        """
        # group scene indices by program shape
        groups: Dict[tuple, list] = {}
        plans = []
        for idx, img in enumerate(images):
            plan = self._plan(img)
            plans.append(plan)
            if plan.num_tiles == 0:
                continue
            # plan.origins (not just num_tiles) must be part of the key:
            # bucketing pads different real tile grids to the same count, but
            # _stage_group ships ONE origin array for the whole group — scenes
            # may only share a dispatch if their real grids are identical.
            key = (plan.canvas_h, plan.canvas_w, plan.origins, img.shape[:2]
                   if not self.cfg.bucket_sizes else None)
            groups.setdefault(key, []).append(idx)

        parts = []  # (scene indices, plan) per dispatch
        for key, idxs in groups.items():
            plan = plans[idxs[0]]
            cap = self._group_size(plan.num_tiles)
            start = 0
            for size in self._split_group(len(idxs), cap):
                parts.append((idxs[start : start + size], plan))
                start += size

        degenerate = [
            (idx, img.shape[:2])
            for idx, img in enumerate(images)
            if plans[idx].num_tiles == 0
        ]

        def dispatch(part, plan):
            imgs = [images[i] for i in part]
            fn, staged = self._stage_group(imgs, plan)
            out = fn(self.params, self.states, *staged)
            return (part, out, [im.shape[:2] for im in imgs])

        max_in_flight = max(1, max_in_flight)
        pending = [dispatch(*p) for p in parts[:max_in_flight]]

        def run():
            next_up = max_in_flight
            while pending:
                part, out, sizes = pending.pop(0)
                if next_up < len(parts):  # keep the window full
                    pending.append(dispatch(*parts[next_up]))
                    next_up += 1
                planes = np.asarray(out)
                masks = self._masks_from_planes(planes, sizes)
                for i, m in zip(part, masks):
                    yield i, m
            for idx, (h, w) in degenerate:
                zero = np.zeros((h, w), np.uint8)
                yield idx, {name: zero.copy() for name in self.names}

        return run()

    def predict_masks_many(self, images, max_in_flight: int = 8) -> list:
        """Pipelined, scene-grouped batch prediction; results in input order."""
        results: list = [None] * len(images)
        for idx, masks in self.predict_masks_iter(images, max_in_flight):
            results[idx] = masks
        return results

    def predict_vote(
        self, image_rgb: np.ndarray, threshold: int = 3
    ) -> np.ndarray:
        """Fast path: plain 3-of-5 vote without the reference's per-model
        morphological cleanup (`model_fuse.py:285-313`) — NOT mask-parity
        with the reference; use the Pipeline for that."""
        masks = self.predict_masks(image_rgb)
        votes = sum(
            (masks[name] > 0).astype(np.int32) for name in self.names
        )
        return np.where(votes >= threshold, 255, 0).astype(np.uint8)
