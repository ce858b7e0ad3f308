"""Tiled scene inference: batched, jitted, resident in HBM.

Replaces the reference hot loop (`/root/reference/predict.py:90-116`) which
calls ``model.predict`` once per tile per model (batch size 1, host round trip
per tile).  Here one jitted program per (canvas shape, tile count) takes the
whole scene through: normalize -> gather tiles -> chunked batched forward ->
argmax -> scatter-OR canvas.  The host sees exactly two transfers per scene
per model: image up, mask down.

The per-model binary mask it returns is bit-compatible with the reference's
``np.where(pred_result >= 1, 255, 0)`` (`predict.py:114`): overlapping tile
votes are OR-ed.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import TilerConfig
from building_detection_tpu.ops import tiling as T

Array = jax.Array


class TiledPredictor:
    """Runs one model over arbitrarily large scenes via sliding-window tiles.

    Args:
      model_fn: a zoo model ``fn(scope, x) -> softmax probs``.
      params / state: the model's variables.
      cfg: tiler geometry (defaults = reference constants).
      batch_tiles: tiles per forward chunk (static; trades HBM for MXU
        utilisation).
      compute_dtype: activation dtype; ``bfloat16`` for speed,
        ``float32`` for bit-parity runs.
    """

    def __init__(
        self,
        model_fn: Callable,
        params,
        state,
        cfg: TilerConfig = TilerConfig(),
        batch_tiles: int = 8,
        compute_dtype=jnp.bfloat16,
        mesh=None,
        device=None,
        tp: bool = False,
        int8_pointwise: bool = False,
        int8_scales: Optional[dict] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis; tile
        batches shard across it (tile data parallelism over ICI — SURVEY.md
        section 2.3's configuration 1).  ``batch_tiles`` is per data-axis
        device.  ``device``: pin this model to a single device instead (used
        by the model-parallel ensemble, configuration 2).  ``tp=True``
        additionally shards conv output channels over the mesh's ``model``
        axis (GSPMD channel tensor parallelism; see parallel/tp.py)."""
        self.model_fn = model_fn
        self.params = params
        self.state = state
        self.cfg = cfg
        self.mesh = mesh
        self.device = device
        n_data = 1 if mesh is None else mesh.shape.get("data", 1)
        self.batch_tiles = batch_tiles * n_data
        self.compute_dtype = compute_dtype
        self.int8_pointwise = int8_pointwise
        # static per-site activation amax from core.module.calibrate_int8;
        # baked into the traced program as constants (fast path — the
        # dynamic fallback's per-call max measured slower than bf16)
        self.int8_scales = int8_scales
        if mesh is not None:
            if tp:
                from building_detection_tpu.parallel.tp import (
                    tp_replicate_state,
                    tp_shard_params,
                )

                self.params = tp_shard_params(params, mesh)
                self.state = tp_replicate_state(state, mesh)
            else:
                from building_detection_tpu.parallel import mesh as pmesh

                self.params = pmesh.replicate(params, mesh)
                self.state = pmesh.replicate(state, mesh)
        elif device is not None:
            # pin this model to one device (ensemble model parallelism:
            # committed operands make every dispatch run there)
            self.params = jax.device_put(params, device)
            self.state = jax.device_put(state, device)

    @functools.lru_cache(maxsize=32)
    def _compiled(self, h: int, w: int, canvas_h: int, canvas_w: int, num_tiles: int):
        """One program per (h, w, canvas, tiles); with bucketing, h == w == 0
        and the real extent arrives as runtime scalars, so one program serves
        every scene mapping to the bucket (see bucket_plan)."""
        cfg = self.cfg
        tile = cfg.tile
        batch = min(self.batch_tiles, max(num_tiles, 1))
        num_chunks = -(-num_tiles // batch)
        padded = num_chunks * batch
        runtime_hw = h == 0 and w == 0

        def run(params, state, img_u8: Array, origins: Array, hw: Array) -> Array:
            # The reference writes the normalized image into a zero canvas
            # (`predict.py:102-104`): pad region must be 0.0 in normalized
            # space (mid-gray).
            norm = T.normalize(img_u8, cfg, dtype=self.compute_dtype)
            if runtime_hw:
                # bucketed: img is host-padded to the canvas; mask the pad
                row = lax.broadcasted_iota(jnp.int32, (canvas_h, canvas_w), 0)
                col = lax.broadcasted_iota(jnp.int32, (canvas_h, canvas_w), 1)
                valid = (row < hw[0]) & (col < hw[1])
                canvas = jnp.where(valid[..., None], norm, 0)
            else:
                # static shape: upload the raw image, pad on device (cheaper
                # uploads through the slow tunnel)
                canvas = jnp.pad(
                    norm, ((0, canvas_h - h), (0, canvas_w - w), (0, 0))
                )
            # pad origins by repeating the last tile (OR is idempotent)
            if padded != num_tiles:
                reps = jnp.broadcast_to(origins[-1:], (padded - num_tiles, 2))
                origins_p = jnp.concatenate([origins, reps], axis=0)
            else:
                origins_p = origins
            chunks = origins_p.reshape(num_chunks, batch, 2)
            mask_canvas = jnp.zeros((canvas_h, canvas_w), jnp.uint8)

            def body(carry, chunk_origins):
                tiles = T.extract_tiles(canvas, chunk_origins, tile)
                if self.mesh is not None:
                    # tile data parallelism: shard the batch over the mesh's
                    # data axis; XLA gathers the masks back for the scatter
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    tiles = jax.lax.with_sharding_constraint(
                        tiles,
                        NamedSharding(self.mesh, P("data", None, None, None)),
                    )
                probs, _ = M.apply(
                    self.model_fn,
                    params,
                    state,
                    tiles,
                    compute_dtype=self.compute_dtype,
                    int8_pointwise=self.int8_pointwise,
                    int8_scales=self.int8_scales,
                )
                masks = (jnp.argmax(probs, axis=-1) == 1).astype(jnp.uint8)

                def put(c, i):
                    o = chunk_origins[i]
                    cur = lax.dynamic_slice(c, (o[0], o[1]), (tile, tile))
                    return (
                        lax.dynamic_update_slice(
                            c, jnp.maximum(cur, masks[i]), (o[0], o[1])
                        ),
                        None,
                    )

                carry, _ = lax.scan(
                    lambda c, i: put(c, i), carry, jnp.arange(batch)
                )
                return carry, None

            mask_canvas, _ = lax.scan(body, mask_canvas, chunks)
            if not runtime_hw:
                # crop the pad margin on device; the host fetch is the
                # down-link bottleneck, don't ship pad bytes
                mask_canvas = mask_canvas[:h, :w]
            return mask_canvas * jnp.uint8(255)

        return jax.jit(run)

    def plan_and_stage(self, image_rgb: np.ndarray):
        """Host-side prep: (plan | None, staged uint8 array, h, w).

        Separated from :meth:`dispatch` so the ensemble runner can upload ONE
        staged scene and share it across members instead of paying the
        host->device transfer once per member."""
        h, w = image_rgb.shape[:2]
        plan = T.plan_tiles(h, w, self.cfg)
        if plan.num_tiles == 0:
            # Degenerate scenes (dim <= overlap) produce a blank mask in the
            # reference (`predict.py:105-106` loops never run).
            return None, None, h, w
        if self.cfg.bucket_sizes:
            plan = T.bucket_plan(plan, self.cfg)
            staged = np.zeros((plan.canvas_h, plan.canvas_w, 3), np.uint8)
            staged[:h, :w] = image_rgb
        else:
            staged = image_rgb
        return plan, staged, h, w

    def dispatch_staged(self, img_dev, hw_dev, plan, h: int, w: int):
        """Enqueue the scene's program on already-uploaded device arrays."""
        if self.cfg.bucket_sizes:
            fn = self._compiled(0, 0, plan.canvas_h, plan.canvas_w, plan.num_tiles)
        else:
            fn = self._compiled(h, w, plan.canvas_h, plan.canvas_w, plan.num_tiles)
        mask = fn(self.params, self.state, img_dev, T.origins_array(plan), hw_dev)
        return mask, h, w

    def dispatch(self, image_rgb: np.ndarray):
        """Enqueue the scene's program; returns (device_array | None, h, w).

        Fetch with :meth:`fetch`.  Splitting dispatch from fetch lets callers
        overlap several models/scenes (the device queue is async; only a host
        fetch blocks).
        """
        plan, staged, h, w = self.plan_and_stage(image_rgb)
        if plan is None:
            return None, h, w
        if self.device is not None:
            img = jax.device_put(staged, self.device)
            hw = jax.device_put(np.asarray([h, w], np.int32), self.device)
        else:
            img = jnp.asarray(staged)
            hw = jnp.asarray([h, w], jnp.int32)
        return self.dispatch_staged(img, hw, plan, h, w)

    @staticmethod
    def fetch(dispatched) -> np.ndarray:
        mask, h, w = dispatched
        if mask is None:
            return np.zeros((h, w), np.uint8)
        return np.asarray(mask)[:h, :w]

    def predict_mask(self, image_rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H, W) uint8 {0, 255} building mask."""
        return self.fetch(self.dispatch(image_rgb))


class EnsemblePredictor:
    """The 5-model ensemble of the reference (`/root/reference/predict.py:75-87`).

    Keeps all five models resident on device; returns the per-model masks in
    the reference's execution order.
    """

    def __init__(
        self,
        members: Dict[str, Tuple[Callable, dict, dict]],
        cfg: TilerConfig = TilerConfig(),
        batch_tiles: int = 8,
        compute_dtype=jnp.bfloat16,
        devices: Optional[list] = None,
        int8_pointwise: bool = False,
        int8_scales: Optional[Dict[str, dict]] = None,
    ):
        """``devices``: assign ensemble members round-robin to these devices
        (model parallelism over the ensemble, SURVEY.md section 2.3's
        configuration 2 — the reference's disabled process-per-model idea,
        `buildAPI.py:152-200`, done properly).  All five members then run
        CONCURRENTLY: dispatches are async, only the fetch blocks."""
        self.predictors = {
            name: TiledPredictor(
                fn,
                params,
                state,
                cfg,
                batch_tiles,
                compute_dtype,
                device=devices[i % len(devices)] if devices else None,
                int8_pointwise=int8_pointwise,
                int8_scales=(int8_scales or {}).get(name),
            )
            for i, (name, (fn, params, state)) in enumerate(members.items())
        }

    def predict_masks(self, image_rgb: np.ndarray) -> Dict[str, np.ndarray]:
        # Stage the scene ONCE and upload it once per distinct device (round
        # 1 uploaded it once per MEMBER — 5x the bytes through the link);
        # then dispatch all members (concurrent across devices) and fetch.
        preds = list(self.predictors.items())
        plan, staged, h, w = preds[0][1].plan_and_stage(image_rgb)
        if plan is None:
            return {name: np.zeros((h, w), np.uint8) for name, _ in preds}
        hw_host = np.asarray([h, w], np.int32)
        per_device: dict = {}
        dispatched = {}
        for name, p in preds:
            key = p.device
            if key not in per_device:
                if key is None:
                    per_device[key] = (jnp.asarray(staged), jnp.asarray(hw_host))
                else:
                    per_device[key] = (
                        jax.device_put(staged, key),
                        jax.device_put(hw_host, key),
                    )
            img_dev, hw_dev = per_device[key]
            dispatched[name] = p.dispatch_staged(img_dev, hw_dev, plan, h, w)
        return {
            name: TiledPredictor.fetch(d) for name, d in dispatched.items()
        }
