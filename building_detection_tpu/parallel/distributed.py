"""Multi-process (multi-host) execution: ``jax.distributed`` + per-host data.

The reference is strictly single-GPU, single-process (SURVEY.md section 2.3).
This module is the framework's scale-out story beyond one host: on a TPU pod
each host drives its local chips and all hosts execute the same SPMD program
over one global :class:`jax.sharding.Mesh`; XLA places the cross-host
collectives on ICI/DCN.  Nothing else in the framework changes — the trainer
and mesh helpers already operate on global meshes/shardings, and under
multi-process JAX:

* ``jax.devices()`` returns the GLOBAL device list, so ``pmesh.make_mesh()``
  builds the global mesh on every process;
* ``jax.device_put(host_value, sharding)`` accepts global host values on all
  processes (each transfers only its addressable shards), so the existing
  replicate/shard paths work verbatim when every host feeds identical data;
* fully-replicated outputs (params, metrics) remain fetchable on every
  process, so metric aggregation and checkpoint export work verbatim.

What this module adds on top:

* :func:`init_distributed` — one-call runtime bring-up (on a real pod the
  no-argument form auto-detects the pod topology; explicit
  coordinator/num/id supports CPU-based multi-process testing, which is how
  tests/test_distributed.py exercises real cross-process collectives without
  a pod);
* per-host **data feeding**: :func:`local_sample_indices` tells each process
  which global samples its local devices own, and
  :func:`global_from_local` assembles a global sharded array from those
  process-local rows (``jax.make_array_from_process_local_data``) — so each
  host decodes only ``1/num_processes`` of the dataset instead of all of it;
* :func:`is_primary` — single-writer guard for checkpoints/history/logs.

Numerics note: multi-process gradient all-reduce orders the reduction
differently from a single-process mesh program, so trained weights agree to
float noise, not bitwise (the same one-compiled-program rule documented in
docs/ARCHITECTURE.md applies; within ONE multi-process topology results are
deterministic run-to-run).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from building_detection_tpu.parallel import mesh as pmesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialise the JAX distributed runtime (idempotent).

    On a real TPU pod slice call with no arguments — the runtime reads the
    pod metadata.  For multi-process CPU testing (or explicit setups), pass
    ``coordinator_address='host:port'``, ``num_processes`` and
    ``process_id``.  Must run before any JAX backend is touched.
    """
    # NOT jax.process_count(): that would itself initialise the XLA backend,
    # after which the distributed runtime refuses to start
    if jax.distributed.is_initialized():
        return  # already initialised
    if coordinator_address is None and num_processes is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )


def is_primary() -> bool:
    """True on the process that should write checkpoints/history/logs."""
    return jax.process_index() == 0


def _owned_rows(sharding, n_rows: int, row_dim: int) -> np.ndarray:
    """Sorted global row indices (along ``row_dim``) whose shards live on
    THIS process's devices, for an array with ``n_rows`` rows."""
    shape = [1] * (row_dim + 1)
    shape[row_dim] = n_rows
    owned = set()
    for dev, idx in sharding.devices_indices_map(tuple(shape)).items():
        if dev.process_index != jax.process_index():
            continue
        sl = idx[row_dim]
        owned.update(range(*sl.indices(n_rows)))
    return np.asarray(sorted(owned), dtype=np.int64)


def local_sample_indices(n_samples: int, batch_size: int, mesh) -> np.ndarray:
    """Global sample indices this process must feed, for a dataset that will
    be iterated in global batches of ``batch_size`` (``fit_arrays`` /
    ``stage_dataset`` order: batch k = samples ``[k*b, (k+1)*b)``).

    The data mesh axis splits every global batch into per-device rows; this
    returns, in feeding order, the union of the rows owned by this process's
    devices across all complete batches.  With one process this is simply
    ``arange(steps * batch_size)``.

    ``mesh`` is required and must be THE mesh the trainer will shard over
    (``trainer.mesh``): a default-built mesh here could disagree with the
    trainer's batch-size-capped one and silently assign the wrong rows.
    """
    sh = pmesh.data_sharded(mesh, 1)
    batch_rows = _owned_rows(sh, batch_size, 0)
    steps = n_samples // batch_size
    return (
        np.arange(steps, dtype=np.int64)[:, None] * batch_size + batch_rows
    ).reshape(-1)


def global_from_local(local_array, sharding) -> jax.Array:
    """Assemble a globally-sharded device array from this process's rows.

    ``local_array`` holds ONLY the rows owned by this process (ascending
    global order along the sharded dimension, i.e. the order
    :func:`local_sample_indices` yields); every process calls this with its
    own rows and the result is one global array sharded per ``sharding``.
    Falls back to a plain transfer under single-process execution, where the
    local rows ARE the global array.
    """
    local_array = np.asarray(local_array)
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    return jax.make_array_from_process_local_data(sharding, local_array)


def stage_local_dataset(
    trainer, images_local, labels_local
) -> Tuple[jax.Array, jax.Array]:
    """Multi-host :meth:`Trainer.stage_dataset`: each process passes only the
    samples :func:`local_sample_indices` assigned to it (ascending order) and
    the staged ``(steps, batch, ...)`` arrays come out globally sharded.

    Single-process, this matches ``trainer.stage_dataset`` exactly.
    """
    images_local = np.asarray(images_local)
    labels_local = np.asarray(labels_local)
    mesh = trainer.mesh
    b = trainer.cfg.batch_size
    sh = pmesh.data_sharded(mesh, 1)
    b_local = len(_owned_rows(sh, b, 0))
    if b_local == 0:
        raise ValueError("this process owns no rows of the data axis")
    steps = len(images_local) // b_local
    if steps == 0:
        raise ValueError(f"need at least one local batch of {b_local} samples")
    n = steps * b_local
    imgs = images_local[:n].reshape((steps, b_local) + images_local.shape[1:])
    labs = labels_local[:n].reshape((steps, b_local) + labels_local.shape[1:])
    return (
        global_from_local(imgs, pmesh.staged_sharded(mesh, imgs.ndim)),
        global_from_local(labs, pmesh.staged_sharded(mesh, labs.ndim)),
    )
