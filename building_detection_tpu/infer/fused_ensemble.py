"""Fused ensemble: all five models in ONE jitted program per scene shape.

The reference runs the ensemble as five sequential per-tile predict loops
(`/root/reference/predict.py:78-87`).  :class:`~building_detection_tpu.infer.
engine.EnsemblePredictor` already batches tiles per model; this variant goes
further and traces the whole ensemble into a single XLA program:

* tiles are gathered and normalised ONCE and shared by all five models;
* one dispatch per scene instead of five (dispatch through this
  environment's TPU tunnel is expensive);
* XLA schedules the five models' ops together, filling pipeline bubbles;
* the 3-of-5 vote (`model_fuse.py:315-323`) is available on device for the
  fast path (``predict_vote``), while per-model masks remain available for
  the parity path's morphological fusion.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import TilerConfig
from building_detection_tpu.ops import tiling as T

Array = jax.Array


class FusedEnsemblePredictor:
    """Drop-in alternative to EnsemblePredictor with one program per scene."""

    def __init__(
        self,
        members: Dict[str, Tuple[Callable, dict, dict]],
        cfg: TilerConfig = TilerConfig(),
        batch_tiles: int = 8,
        compute_dtype=jnp.bfloat16,
        mesh=None,
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
        if mesh is not None:
            from building_detection_tpu.parallel import mesh as pmesh

            self.params = pmesh.replicate(self.params, mesh)
            self.states = pmesh.replicate(self.states, mesh)

    @functools.lru_cache(maxsize=32)
    def _compiled(self, h: int, w: int, canvas_h: int, canvas_w: int, num_tiles: int):
        cfg = self.cfg
        tile = cfg.tile
        batch = min(self.batch_tiles, max(num_tiles, 1))
        num_chunks = -(-num_tiles // batch)
        padded = num_chunks * batch
        n_models = len(self.names)
        runtime_hw = h == 0 and w == 0

        def run(params, states, img_u8: Array, origins: Array, hw: Array) -> Array:
            # Pad region is forced to 0.0 in normalized space (reference
            # contract, predict.py:102-104).  With bucketing (h == w == 0)
            # the image arrives host-padded and the real extent is a runtime
            # scalar pair; otherwise the raw image pads on device (cheaper
            # uploads through the slow tunnel).
            norm = T.normalize(img_u8, cfg, dtype=self.compute_dtype)
            if runtime_hw:
                row = lax.broadcasted_iota(jnp.int32, (canvas_h, canvas_w), 0)
                col = lax.broadcasted_iota(jnp.int32, (canvas_h, canvas_w), 1)
                canvas = jnp.where(
                    ((row < hw[0]) & (col < hw[1]))[..., None], norm, 0
                )
            else:
                canvas = jnp.pad(
                    norm, ((0, canvas_h - h), (0, canvas_w - w), (0, 0))
                )
            if padded != num_tiles:
                reps = jnp.broadcast_to(origins[-1:], (padded - num_tiles, 2))
                origins = jnp.concatenate([origins, reps], axis=0)
            chunks = origins.reshape(num_chunks, batch, 2)
            # the 5 per-model bits are PACKED into one uint8 plane: 5x less
            # device->host traffic (the tunnel in this environment moves
            # ~20 MB/s, so mask download would otherwise dominate)
            mask_canvas = jnp.zeros((canvas_h, canvas_w), jnp.uint8)

            def body(carry, chunk_origins):
                tiles = T.extract_tiles(canvas, chunk_origins, tile)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    tiles = lax.with_sharding_constraint(
                        tiles,
                        NamedSharding(self.mesh, P("data", None, None, None)),
                    )
                packed = jnp.zeros(tiles.shape[:3], jnp.uint8)
                for bit, name in enumerate(self.names):
                    probs, _ = M.apply(
                        self.fns[name],
                        params[name],
                        states[name],
                        tiles,
                        compute_dtype=self.compute_dtype,
                    )
                    m = (jnp.argmax(probs, axis=-1) == 1).astype(jnp.uint8)
                    packed = packed | (m << bit)

                def put(c, i):
                    o = chunk_origins[i]
                    cur = lax.dynamic_slice(c, (o[0], o[1]), (tile, tile))
                    # per-bit OR over overlapping tiles == the reference's
                    # accumulate-then->=1 per model (predict.py:113-114)
                    return (
                        lax.dynamic_update_slice(
                            c, cur | packed[i], (o[0], o[1])
                        ),
                        None,
                    )

                carry, _ = lax.scan(put, carry, jnp.arange(batch))
                return carry, None

            mask_canvas, _ = lax.scan(body, mask_canvas, chunks)
            if not runtime_hw:
                # crop the pad margin ON DEVICE: the host fetch is the
                # pipeline's down-link bottleneck, don't ship pad bytes
                mask_canvas = mask_canvas[:h, :w]
            return mask_canvas

        return jax.jit(run)

    def _stage(self, image_rgb: np.ndarray, plan):
        """(compiled_fn, staged device args) for one scene."""
        h, w = image_rgb.shape[:2]
        if self.cfg.bucket_sizes:
            fn = self._compiled(0, 0, plan.canvas_h, plan.canvas_w, plan.num_tiles)
            staged = np.zeros((plan.canvas_h, plan.canvas_w, 3), np.uint8)
            staged[:h, :w] = image_rgb
        else:
            fn = self._compiled(h, w, plan.canvas_h, plan.canvas_w, plan.num_tiles)
            staged = image_rgb
        return fn, (
            jnp.asarray(staged),
            T.origins_array(plan),
            jnp.asarray([h, w], jnp.int32),
        )

    def _run_packed(self, image_rgb: np.ndarray) -> np.ndarray:
        """(H, W) uint8 with one mask bit per ensemble member."""
        h, w = image_rgb.shape[:2]
        plan = T.plan_tiles(h, w, self.cfg)
        if plan.num_tiles == 0:
            return np.zeros((h, w), np.uint8)
        if self.cfg.bucket_sizes:
            plan = T.bucket_plan(plan, self.cfg)
        fn, staged = self._stage(image_rgb, plan)
        packed = fn(self.params, self.states, *staged)
        return np.asarray(packed)[:h, :w]

    def predict_masks(self, image_rgb: np.ndarray) -> Dict[str, np.ndarray]:
        packed = self._run_packed(image_rgb)
        return {
            name: (((packed >> bit) & 1) * np.uint8(255))
            for bit, name in enumerate(self.names)
        }

    def predict_masks_many(self, images) -> list:
        """Pipelined batch prediction over multiple scenes.

        Dispatches every scene's program before fetching any result: the
        device queue executes FIFO, so scene N+1's upload and launch overlap
        scene N's compute — on tunneled/remote devices this hides most of the
        host<->device transfer time that dominates single-scene latency.
        """
        pending = []
        for image_rgb in images:
            h, w = image_rgb.shape[:2]
            plan = T.plan_tiles(h, w, self.cfg)
            if plan.num_tiles == 0:
                pending.append((None, h, w))
                continue
            if self.cfg.bucket_sizes:
                plan = T.bucket_plan(plan, self.cfg)
            fn, staged = self._stage(image_rgb, plan)
            out = fn(self.params, self.states, *staged)
            pending.append((out, h, w))
        results = []
        for out, h, w in pending:
            if out is None:
                packed = np.zeros((h, w), np.uint8)
            else:
                packed = np.asarray(out)[:h, :w]
            results.append(
                {
                    name: (((packed >> bit) & 1) * np.uint8(255))
                    for bit, name in enumerate(self.names)
                }
            )
        return results

    def predict_vote(
        self, image_rgb: np.ndarray, threshold: int = 3
    ) -> np.ndarray:
        """Fast path: plain 3-of-5 vote without the reference's per-model
        morphological cleanup (`model_fuse.py:285-313`) — NOT mask-parity
        with the reference; use the Pipeline for that."""
        packed = self._run_packed(image_rgb)
        votes = sum(
            ((packed >> bit) & 1).astype(np.int32)
            for bit in range(len(self.names))
        )
        return np.where(votes >= threshold, 255, 0).astype(np.uint8)
