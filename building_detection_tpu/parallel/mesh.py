"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md section 2.3); all multi-device
execution in this framework goes through one ``jax.sharding.Mesh`` and XLA
collectives — no custom transport.  Axes:

* ``data``  — batch / tile data parallelism (gradients all-reduce over ICI);
* ``model`` — reserved for channel tensor parallelism and ensemble groups.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """Mesh over the available devices; ``data=-1`` uses all of them.

    ``batch_size`` (only consulted when ``data=-1``) caps the data axis at
    ``gcd(batch_size, devices)`` so the batch always divides it — an
    8-device host training batch 2 shards 2 ways, not 8 (the shared rule of
    bdt-train/bdt-eval, regression-tested in tests/test_cli.py)."""
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        data = len(devices) // model
        if batch_size is not None:
            data = math.gcd(batch_size, data)
    if data * model != len(devices):
        devices = devices[: data * model]
    arr = np.array(devices).reshape(data, model)
    if jax.process_count() > 1:
        # Multi-process: the gcd cap above truncates to the first data*model
        # GLOBAL devices, and a process whose devices all fell off the end
        # would own no rows of any sharded array — its feeds would be empty
        # and the run would die far from the cause.  Fail here, actionably.
        in_mesh = {d.process_index for d in arr.flat}
        missing = sorted(set(range(jax.process_count())) - in_mesh)
        if missing:
            raise ValueError(
                f"mesh uses {arr.size} of {len(jax.devices())} global devices "
                f"and excludes all devices of process(es) {missing} "
                f"(batch_size={batch_size} caps the data axis at "
                f"{data}); raise --batch-size to cover the pod or pass "
                f"--data-parallel explicitly"
            )
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def staged_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the SECOND dim (batch) of (steps, batch, ...) staged datasets."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (leading dim divisible by |data|) onto the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharded(mesh, np.ndim(x))), batch
    )


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )
