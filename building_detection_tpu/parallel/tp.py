"""Channel tensor parallelism via GSPMD sharding annotations.

The reference has no multi-device execution at all (SURVEY.md section 2.3);
the natural TP formulation for these conv nets on TPU is to shard every
kernel's OUTPUT-channel dimension over the mesh's ``model`` axis and let
XLA's SPMD partitioner place the collectives — no manual ``psum``/
``all_gather`` (the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives).

Kernels whose output-channel count does not divide the axis (1-channel
gates in sSE, the 2-class head, biases of tiny layers) stay replicated —
partial TP, correct by construction.  Equality with single-device execution
is asserted in ``tests/test_parallel.py``.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from building_detection_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(name: str, shape, axis_size: int):
    """PartitionSpec sharding the out-channel dim if it divides the axis."""
    ndim = len(shape)
    if ndim == 0:
        return P()
    # conv kernels (kh,kw,in,out), convT (kh,kw,out,in) — TF layout puts the
    # transposed conv's OUT channels at dim -2; dense (in,out); bias (out,)
    if "conv2d_transpose" in name and name.endswith("kernel") and ndim == 4:
        out_dim = ndim - 2
    else:
        out_dim = ndim - 1
    if shape[out_dim] % axis_size == 0 and shape[out_dim] >= axis_size:
        spec = [None] * ndim
        spec[out_dim] = MODEL_AXIS
        return P(*spec)
    return P()


def tp_shard_params(params: Dict[str, jax.Array], mesh: Mesh):
    """device_put every parameter with its TP sharding over ``mesh``."""
    axis_size = mesh.shape[MODEL_AXIS]
    out = {}
    for name, value in params.items():
        spec = _spec_for(name, np.shape(value), axis_size)
        out[name] = jax.device_put(value, NamedSharding(mesh, spec))
    return out


def tp_replicate_state(state: Dict[str, jax.Array], mesh: Mesh):
    """BN statistics are per-channel vectors; shard those that divide, else
    replicate (they are tiny either way)."""
    axis_size = mesh.shape[MODEL_AXIS]
    out = {}
    for name, value in state.items():
        shape = np.shape(value)
        if len(shape) == 1 and shape[0] % axis_size == 0 and shape[0] >= axis_size:
            spec = P(MODEL_AXIS)
        else:
            spec = P()
        out[name] = jax.device_put(value, NamedSharding(mesh, spec))
    return out
