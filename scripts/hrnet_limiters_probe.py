"""Probe hrnet's two measured MFU limiters for exploitable headroom.

BASELINE.md round 2 pinned hrnet at 38% MFU (batch 128) on two limiters:

1. the 32-channel 256^2 branch convs fill only 32/128 MXU lanes;
2. layer1's 256-channel 256^2 bottleneck blocks run at their HBM roofline.

This probe measures, in isolation on the chip:

* (1a) a chain of 3x3 32->32 convs at (128, 256, 256, 32) in stock NHWC;
* (1b) the same chain with the batch axis moved to the minor (lane)
  position via ``dimension_numbers`` (HWCN operands) — if XLA maps lanes
  from the minor dimension, fill goes 25% -> 100%;
* (1c) the same chain with explicit transposes at the segment edges only
  (what an integration would pay);
* (2) one layer1 identity block (1x1 256->64, 3x3 64, 1x1 64->256 + add)
  at (128, 256, 256, 256), reporting achieved TFLOP/s and effective HBM
  traffic against the ~819 GB/s v5e roofline.

Usage: python scripts/hrnet_limiters_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bench import wait_for_backend

    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    B, H, W, C = 128, 256, 256, 32
    DEPTH = 8  # chain length amortizes edge effects
    k = jax.random.normal(jax.random.key(0), (3, 3, C, C), jnp.bfloat16) * 0.1

    def time_fn(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(out)  # host fetch is the only real sync on this backend
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best / iters

    conv_flops = 2 * 9 * C * C * H * W * B * DEPTH

    # (1a) stock NHWC chain
    @jax.jit
    def chain_nhwc(x, k):
        for _ in range(DEPTH):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=None,
            )
            x = jnp.maximum(x, 0)
        return jnp.sum(x.astype(jnp.float32))

    x = jax.random.normal(jax.random.key(1), (B, H, W, C), jnp.bfloat16)
    dt = time_fn(chain_nhwc, x, k)
    print(f"(1a) NHWC 3x3x{C} chain:      {dt * 1e3:7.2f} ms  "
          f"{conv_flops / dt / 1e12:6.1f} TF/s", flush=True)

    # (1b) HWCN chain: batch in the minor position end-to-end
    @jax.jit
    def chain_hwcn(x, k):
        for _ in range(DEPTH):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("HWCN", "HWIO", "HWCN"),
                precision=None,
            )
            x = jnp.maximum(x, 0)
        return jnp.sum(x.astype(jnp.float32))

    xt = jnp.transpose(x, (1, 2, 3, 0))  # (H, W, C, N)
    dt = time_fn(chain_hwcn, xt, k)
    print(f"(1b) HWCN 3x3x{C} chain:      {dt * 1e3:7.2f} ms  "
          f"{conv_flops / dt / 1e12:6.1f} TF/s", flush=True)

    # (1c) NHWC in/out with transposes at the segment edges
    @jax.jit
    def chain_edges(x, k):
        x = jnp.transpose(x, (1, 2, 3, 0))
        for _ in range(DEPTH):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("HWCN", "HWIO", "HWCN"),
                precision=None,
            )
            x = jnp.maximum(x, 0)
        x = jnp.transpose(x, (3, 0, 1, 2))
        return jnp.sum(x.astype(jnp.float32))

    dt = time_fn(chain_edges, x, k)
    print(f"(1c) edge-transposed chain:  {dt * 1e3:7.2f} ms  "
          f"{conv_flops / dt / 1e12:6.1f} TF/s", flush=True)

    # (2) one layer1 identity block at 256 channels
    C2 = 256
    k1 = jax.random.normal(jax.random.key(2), (1, 1, C2, 64), jnp.bfloat16) * 0.1
    k2 = jax.random.normal(jax.random.key(3), (3, 3, 64, 64), jnp.bfloat16) * 0.1
    k3 = jax.random.normal(jax.random.key(4), (1, 1, 64, C2), jnp.bfloat16) * 0.1

    @jax.jit
    def identity_block(x, k1, k2, k3):
        dn = ("NHWC", "HWIO", "NHWC")
        y = jax.lax.conv_general_dilated(x, k1, (1, 1), "SAME", dimension_numbers=dn)
        y = jnp.maximum(y, 0)
        y = jax.lax.conv_general_dilated(y, k2, (1, 1), "SAME", dimension_numbers=dn)
        y = jnp.maximum(y, 0)
        y = jax.lax.conv_general_dilated(y, k3, (1, 1), "SAME", dimension_numbers=dn)
        return jnp.sum(jnp.maximum(y + x, 0).astype(jnp.float32))

    x2 = jax.random.normal(jax.random.key(5), (B, H, W, C2), jnp.bfloat16)
    dt = time_fn(identity_block, x2, k1, k2, k3)
    flops = 2 * H * W * B * (C2 * 64 + 9 * 64 * 64 + 64 * C2)
    big = B * H * W * C2 * 2  # bytes of one 256-ch bf16 tensor
    small = B * H * W * 64 * 2
    naive_traffic = 2 * big + 2 * small + (2 * small) + big  # R/W per conv + resid
    fused_traffic = 2 * big
    print(f"(2)  identity block 256ch:   {dt * 1e3:7.2f} ms  "
          f"{flops / dt / 1e12:6.1f} TF/s  "
          f"naive-traffic BW {naive_traffic / dt / 1e9:5.0f} GB/s  "
          f"fused-bound {fused_traffic / 819e9 * 1e3:5.1f} ms", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
