"""Pallas TPU kernel: fused edge-weight-map generation.

The training target builder needs, per label image, an 11x11 erosion, an
11x11 dilation and two elementwise comparisons
(`/root/reference/train_model/res34.py:81-104`; our XLA version is
:func:`building_detection_tpu.ops.morphology.edge_weight_maps`).  As separate
XLA ops that is four-plus HBM round trips over the (N, 512, 512) label
tensor.  This kernel does the whole thing in one pass: each grid step DMAs
one label image into VMEM, runs the separable log-decomposed min/max filters
on the VPU, and writes both weight maps — one HBM read, two writes.

The morphology math matches cv2 semantics exactly (border = identity value);
``tests/test_kernels.py`` pins it against the XLA implementation, which is
itself pinned against cv2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels run via interpret mode there
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

Array = jax.Array


def _win_filter(x: Array, w: int, axis: int, op, identity: float) -> Array:
    """Centered width-w sliding min/max along axis, O(log w) VPU ops.

    Out-of-range positions contribute ``identity`` (cv2 border semantics).
    Uses roll+mask instead of pad so the buffer shape stays fixed in VMEM.
    """
    if w == 1:
        return x
    n = x.shape[axis]
    r = (w - 1) // 2
    # pad to length n + w - 1 so every needed window is inside the buffer
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, w - 1 - r)
    xp = jnp.pad(x, pad, constant_values=identity)
    length = n + w - 1

    def shifted(m: Array, offset: int) -> Array:
        """out(i) = m(i + offset); beyond-buffer -> identity."""
        s = jnp.roll(m, -offset, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, axis)
        valid = idx < (length - offset)
        return jnp.where(valid, s, jnp.asarray(identity, x.dtype))

    # left-aligned power-of-two windows by doubling: M_P(i) = op xp[i..i+P)
    m = xp
    p = 1
    while p * 2 <= w:
        m = op(m, shifted(m, p))
        p *= 2
    # combine two overlapping P-windows covering xp[i .. i+w)
    combined = op(m, shifted(m, w - p))
    return jax.lax.slice_in_dim(combined, 0, n, axis=axis)


def _edge_kernel(label_ref, f_ref, p_ref, *, kernel: int, iterations: int, weight: float):
    x = label_ref[0]  # (H, W) float32 in {0, 1}
    w = iterations * (kernel - 1) + 1
    jmin, jmax = jnp.minimum, jnp.maximum
    eroded = _win_filter(_win_filter(x, w, 0, jmin, jnp.inf), w, 1, jmin, jnp.inf)
    dilated = _win_filter(_win_filter(x, w, 0, jmax, -jnp.inf), w, 1, jmax, -jnp.inf)
    p_ref[0] = jnp.where(x - eroded == 1.0, weight, 1.0)
    f_ref[0] = jnp.where(dilated - x == 1.0, weight, 1.0)


@functools.partial(
    jax.jit, static_argnames=("kernel", "iterations", "weight", "interpret")
)
def edge_weight_maps_pallas(
    label: Array,
    kernel: int = 3,
    iterations: int = 5,
    weight: float = 2.0,
    interpret: bool = False,
):
    """(N, H, W) {0,1} float labels -> (f_edge, p_edge), fused in VMEM.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    label = label.astype(jnp.float32)
    n, h, w = label.shape
    body = functools.partial(
        _edge_kernel, kernel=kernel, iterations=iterations, weight=weight
    )
    block = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))
    f_edge, p_edge = pl.pallas_call(
        body,
        grid=(n,),
        in_specs=[block],
        out_specs=(block, block),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        ),
        interpret=interpret,
    )(label)
    return f_edge, p_edge
