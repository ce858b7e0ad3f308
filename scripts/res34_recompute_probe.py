"""Probe: does recomputing res34's 512^2 c1 skip late beat holding it live?

Round-2 profiling attributed res34's MFU gap (57% at batch 128) partly to
XLA buffer-compression traffic on the 4.3 GB bf16 c1 skip (B,512,512,64)
that stays live from the stem to the last decoder stage
(`models/res34_unet.py`): the SE-gated copy is produced right after the
encoder and consumed only by `up1`.  This probe measures a variant that

* keeps only the tiny SE gate vector (B,64) live,
* recomputes the three stem convs from the input right before `up1`
  (behind `jax.lax.optimization_barrier` so XLA cannot CSE the recompute
  back into the original stem),
* re-gates the recomputed c1.

Identical parameters (explicit layer names replay the same weights; the
auto-name counter sequence is unchanged), ~8% extra FLOPs, minus one
program-long 4.3 GB live buffer.

Run on the real chip: ``python scripts/res34_recompute_probe.py [batch]``.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(os.environ.get("BDT_PROBE_ITERS", "10"))

    from bench import wait_for_backend

    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from building_detection_tpu.core import module as M
    from building_detection_tpu.core.runtime import enable_compilation_cache
    from building_detection_tpu.models.registry import init_model
    from building_detection_tpu.models.res34_unet import (
        F_SIZE,
        _bn_conv,
        _encoder,
        _low_to_high,
        _upsample_feature,
        res34_unet,
    )
    from building_detection_tpu.nn import layers as L
    from building_detection_tpu.nn.attention import se_block

    enable_compilation_cache()

    def res34_unet_rc(s, x):
        """res34 with the c1 skip recomputed at its use site (same params)."""
        c1, c2, c3, c4, c5 = _encoder(s, x)

        c2, c3 = _low_to_high(s, c1, c2, c3)
        c3, c4 = _low_to_high(s, c2, c3, c4)

        # SE gate for c1 inlined so only the (B, 64) gate stays live; the
        # layer call sequence (dense, BN, dense, BN) matches se_block so the
        # auto-name counters line up with the stock model.
        ch = c1.shape[-1]
        gap = L.global_avg_pool(c1)
        f = L.dense(s, gap, ch // 2)
        f = L.batch_norm(s, f)
        f = L.relu(f)
        f = L.dense(s, f, ch)
        f = L.batch_norm(s, f)
        g1 = L.sigmoid(f)

        c2 = se_block(s, c2)
        c3 = se_block(s, c3)
        c4 = se_block(s, c4)
        c5 = se_block(s, c5)

        up4 = _upsample_feature(s, c4, c5, name="4")
        up3 = _upsample_feature(s, c3, up4, name="3")
        up2 = _upsample_feature(s, c2, up3, name="2")

        # Recompute the stem from the input; the barrier keeps XLA from
        # unifying it with the encoder's stem (which would resurrect the
        # long-lived buffer).
        x2 = jax.lax.optimization_barrier(x)
        r1 = _bn_conv(s, x2, F_SIZE, 3, "conv1_1")
        r1 = _bn_conv(s, r1, F_SIZE, 3, "conv1_2")
        r1 = _bn_conv(s, r1, F_SIZE, 3, "conv1_3")
        c1g = r1 * g1[:, None, None, :]

        up1 = _upsample_feature(s, c1g, up2, name="1")

        out = L.conv2d(s, up1, 64, 3, activation="relu", kernel_init=L.he_normal)
        out = L.conv2d(s, out, 2, 3, activation="softmax", kernel_init=L.he_normal)
        return out

    params, state = init_model("res34", jax.random.key(0), (1, 512, 512, 3))

    def make_fwd(fn):
        def fwd(params, state, x):
            probs, _ = M.apply(fn, params, state, x, compute_dtype=jnp.bfloat16)
            m = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
            return jnp.sum(m.astype(jnp.int32))

        return jax.jit(fwd)

    x = jax.random.uniform(
        jax.random.key(42), (batch, 512, 512, 3), jnp.float32, -1, 1
    )

    results = {}
    for name, fn in (("stock", res34_unet), ("recompute_c1", res34_unet_rc)):
        fwd = make_fwd(fn)
        out = fwd(params, state, x)
        np.asarray(out)  # host fetch = the only real sync on this backend
        compiled = fwd.lower(params, state, x).compile()
        try:
            mem = compiled.memory_analysis()
            peak = getattr(mem, "temp_size_in_bytes", None)
        except Exception:
            peak = None
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(params, state, x)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        tps = batch * iters / best
        results[name] = tps
        peak_gb = f"{peak / 1e9:.2f} GB" if peak else "n/a"
        print(f"{name:>14}: {tps:8.1f} tiles/s  (temp {peak_gb})", flush=True)

    ratio = results["recompute_c1"] / results["stock"]
    print(f"recompute/stock = {ratio:.3f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
