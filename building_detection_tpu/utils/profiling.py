"""Tracing / profiling utilities (SURVEY.md section 5: the reference has
none beyond ad-hoc wall-clock prints, `data_enhancement.py:223-232`).

* :class:`StageTimer` — named wall-clock stages with a summary, used by the
  pipeline to attribute time to tiler / forward / fusion / polygons;
* :func:`device_trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
* :func:`sync` — a REAL device synchronisation.  On the tunneled axon
  backend ``block_until_ready`` does not await execution; fetching one
  element does (the device executes FIFO, so this flushes everything
  enqueued before it).
"""
from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Optional


def sync(x) -> None:
    """Force completion of all device work ordered before ``x``."""
    import numpy as np

    np.asarray(jax_leaf(x))


def jax_leaf(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    return leaves[0] if leaves else x


class StageTimer:
    """Accumulating named wall-clock stages.

    >>> t = StageTimer()
    >>> with t.stage("forward"): ...
    >>> t.summary()  # {'forward': {'seconds': ..., 'calls': ...}}
    """

    def __init__(self):
        import threading

        self._acc: "OrderedDict[str, float]" = OrderedDict()
        self._calls: Dict[str, int] = {}
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                sync(sync_on)
            dt = time.perf_counter() - t0
            with self._lock:  # stages may run on post-processing pool threads
                self._acc[name] = self._acc.get(name, 0.0) + dt
                self._calls[name] = self._calls.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"seconds": round(v, 4), "calls": self._calls[k]}
            for k, v in self._acc.items()
        }

    def report(self) -> str:
        total = sum(self._acc.values()) or 1.0
        lines = [
            f"{k:>16s}: {v:8.3f}s ({100 * v / total:5.1f}%)  x{self._calls[k]}"
            for k, v in self._acc.items()
        ]
        return "\n".join(lines)

    def reset(self) -> None:
        self._acc.clear()
        self._calls.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """``with device_trace('/tmp/trace'):`` captures a jax.profiler trace;
    a None log_dir makes it a no-op."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
