"""Sliding-window tiler as batched on-device array ops.

The reference's hot loop runs ``model.predict`` once per 512x512 tile per
model and accumulates into an int8 canvas on the host
(`/root/reference/predict.py:90-116`).  Here the whole scene -> tiles ->
masks -> canvas round trip stays in HBM:

* geometry (:func:`plan_tiles`) reproduces the reference's padding math
  ``new = ceil((dim-152)/360)*360 + 152``, min 512 (`predict.py:98-102`),
  including the degenerate no-tile case for dims <= overlap;
* the reference's inner loop iterates the *width* axis over ``new_h``
  (`predict.py:106`), mis-tiling non-square scenes — fixed here by default
  (a no-op for square scenes; set ``fix_nonsquare_bug=False`` to replicate);
* tiles are gathered with a vmapped ``dynamic_slice`` and written back with
  a scanned max-update, which reproduces the reference's
  ``accumulate then >= 1`` logical-OR over overlaps (`predict.py:113-114`)
  without int8 overflow.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from building_detection_tpu.core.config import TilerConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static tiling geometry for one scene shape."""

    height: int
    width: int
    canvas_h: int
    canvas_w: int
    origins: Tuple[Tuple[int, int], ...]  # (row, col) of each tile

    @property
    def num_tiles(self) -> int:
        return len(self.origins)


def _axis_tiles(dim: int, cfg: TilerConfig) -> Tuple[int, int]:
    """(padded size, number of tiles) along one axis (`predict.py:98-106`)."""
    n = math.ceil((dim - cfg.overlap) / cfg.stride)
    n = max(n, 0)
    new = n * cfg.stride + cfg.overlap
    return max(new, cfg.tile), n


def plan_tiles(height: int, width: int, cfg: TilerConfig = TilerConfig()) -> TilePlan:
    canvas_h, n_h = _axis_tiles(height, cfg)
    canvas_w, n_w = _axis_tiles(width, cfg)
    if not cfg.fix_nonsquare_bug:
        # Faithful replication of `predict.py:105-106`: both loops run over
        # the height-derived count.  On WIDE scenes that under-tiles (the
        # right part of the canvas is never visited; replicated below).  On
        # TALL scenes the extra column origins overrun the canvas width, the
        # reference's numpy slicing hands the model a TRUNCATED tile
        # (width ``overlap`` first, then empty) and the Keras zoo raises a
        # decoder concat shape mismatch — verified against the real
        # reference under tf_keras 2.21 (scse on a (1, 512, 152, 3) tile:
        # ValueError).  The faithful replication of a crash is a crash.
        n_w = n_h
        if n_w and (n_w - 1) * cfg.stride + cfg.tile > canvas_w:
            raise ValueError(
                f"fix_nonsquare_bug=False on a tall scene ({height}x{width}): "
                "the reference's inner loop (predict.py:106) overruns the "
                "canvas width, feeding the model truncated tiles — the "
                "reference itself crashes here (decoder shape mismatch). "
                "Use fix_nonsquare_bug=True for correct non-square tiling."
            )
    origins = tuple(
        (i * cfg.stride, j * cfg.stride) for i in range(n_h) for j in range(n_w)
    )
    return TilePlan(height, width, canvas_h, canvas_w, origins)


def pad_scene(img: Array, plan: TilePlan) -> Array:
    """Zero-pad (H, W, C) into the tiling canvas (`predict.py:102-104`)."""
    return jnp.pad(
        img,
        ((0, plan.canvas_h - plan.height), (0, plan.canvas_w - plan.width), (0, 0)),
    )


def normalize(img: Array, cfg: TilerConfig = TilerConfig(), dtype=jnp.float32) -> Array:
    """uint8 RGB -> float in [-1, 1] (`predict.py:93`).

    The reference divides in numpy float64 and TF casts at the graph
    boundary, so its models see ``f32(f64(v) / 127.5 - 1)``.  Computing
    ``x/127.5 - 1`` directly in f32 differs by 1 ulp for exactly half the
    uint8 range (v = 64..191), which flips rare argmax ties (first caught
    by ``scripts/pipeline_fuzz.py`` seed 22).  Instead: ``v - 127.5`` is
    EXACT for every uint8 v (a multiple of 0.5 with magnitude <= 127.5),
    so the correctly-rounded quotient ``(v - 127.5) / 127.5`` equals the
    reference's f64-then-cast result on all 256 values.  Two portability
    traps force the Newton form below: XLA's simplifier rewrites
    divide-by-constant into multiply-by-reciprocal (1 ulp off; blocked
    with an optimization_barrier), and the TPU VPU's native f32 divide is
    itself reciprocal-based (~1 ulp low even for exact quotients like
    -127.5/127.5).  One Newton correction on the reciprocal multiply is
    verified bit-exact over all 256 values on BOTH the TPU chip and CPU
    XLA — 4 cheap vector ops/pixel.  (A 256-entry LUT gather was also
    exact but cost ~18% ensemble throughput: per-pixel gathers are slow
    on TPU.)
    """
    if jnp.issubdtype(img.dtype, jnp.integer):
        d = jnp.float32(cfg.normalize_div)
        num = img.astype(jnp.float32) - d
        r = lax.optimization_barrier(jnp.float32(1.0) / d)
        q0 = num * r
        out = q0 + (num - q0 * d) * r
        return out.astype(dtype)
    return img.astype(dtype) / cfg.normalize_div - 1.0


def extract_tiles(canvas: Array, origins: Array, tile: int) -> Array:
    """Gather (T, tile, tile, C) windows from an (H, W, C) canvas."""

    def get(origin):
        return lax.dynamic_slice(
            canvas, (origin[0], origin[1], 0), (tile, tile, canvas.shape[-1])
        )

    return jax.vmap(get)(origins)


def scatter_or(masks: Array, origins: Array, canvas_hw: Tuple[int, int]) -> Array:
    """OR (max) each (T, tile, tile) binary mask back onto the canvas.

    Equivalent to the reference's ``+=`` into int8 then ``>= 1``
    (`predict.py:113-114`), but overflow-free.
    """
    tile = masks.shape[1]
    canvas = jnp.zeros(canvas_hw, masks.dtype)

    def body(c, args):
        m, o = args
        cur = lax.dynamic_slice(c, (o[0], o[1]), (tile, tile))
        c = lax.dynamic_update_slice(c, jnp.maximum(cur, m), (o[0], o[1]))
        return c, None

    canvas, _ = lax.scan(body, canvas, (masks, origins))
    return canvas


def origins_array(plan: TilePlan) -> Array:
    if plan.num_tiles == 0:
        return jnp.zeros((0, 2), jnp.int32)
    return jnp.asarray(np.array(plan.origins, np.int32))


def bucket_plan(plan: TilePlan, cfg: TilerConfig = TilerConfig()) -> TilePlan:
    """Round the static program shape up to a bucket so arbitrary scene sizes
    reuse a handful of compiled programs.

    The canvas grows to the next power-of-two tile-grid size along each axis
    and the origin list is padded by repeating the last REAL origin (OR is
    idempotent, so repeats are no-ops).  Real tiles never touch the extra
    zero canvas and padded "tiles" re-predict an existing window, so the
    cropped mask is bit-identical to the unbucketed plan — only the compiled
    program's static shape changes.  Origins stay a runtime argument.
    """
    if plan.num_tiles == 0:
        return plan

    def bucket_axis(size: int) -> Tuple[int, int]:
        n = max(-(-(size - cfg.overlap) // cfg.stride), 1)
        nb = 1
        while nb < n:
            nb *= 2
        return nb * cfg.stride + cfg.overlap, nb

    canvas_h, n_hb = bucket_axis(plan.canvas_h)
    canvas_w, n_wb = bucket_axis(plan.canvas_w)
    target = n_hb * n_wb
    origins = plan.origins + (plan.origins[-1],) * (target - plan.num_tiles)
    return TilePlan(plan.height, plan.width, canvas_h, canvas_w, origins)
