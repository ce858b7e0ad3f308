"""Measure bf16 BN-affine activations on the res34 training path.

Round-2 established the res34 backward is HBM-pressure-bound (40.5 img/s at
batch 8, 35.4 at 16, OOM at 24 with 23 GB; remat measured useless —
BASELINE.md).  One cell was suggested but never measured (round-4 VERDICT
item 8): keeping the stored activations bf16 END-TO-END.  Under
``compute_dtype=bf16`` the convs already run bf16, but ``nn.layers.
batch_norm`` applies its affine with f32 gamma/beta, so every BN OUTPUT
promotes to f32 (`nn/layers.py:332-334`) — and the stem/encoder residuals
the backward holds live are exactly those tensors (the "4.3 GB/16-image
stem tensors" in the round-2 table; f32 doubles them).

This probe A/Bs stock vs a BN variant whose affine is cast to the compute
dtype (statistics and moving-average updates stay f32 — only the output
dtype changes), at batch 8/16/24:

* images/s (staged-epoch path, best-of-2),
* the step program's temp buffer size (XLA memory_analysis),
* the first-epoch loss trajectory delta (numerics sanity; this variant is
  NOT bit-parity with the TF reference and would ship opt-in like bf16
  inference).

Run on the real chip: ``python scripts/train_bf16_residuals_probe.py``.
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

    from building_detection_tpu.core.config import TrainConfig
    from building_detection_tpu.nn import layers as L
    from building_detection_tpu.train.trainer import Trainer

    stock_bn = L.batch_norm

    def bf16_affine_bn(s, x, momentum=0.99, epsilon=1e-3, name=None):
        """Stock batch_norm, but the output affine stays in x.dtype."""
        out = stock_bn(s, x, momentum=momentum, epsilon=epsilon, name=name)
        return out.astype(s.compute_dtype)

    steps = int(os.environ.get("BDT_PROBE_STEPS", "12"))
    results = {}
    for variant, bn in (("stock", stock_bn), ("bf16-affine", bf16_affine_bn)):
        L.batch_norm = bn
        try:
            for batch in (8, 16, 24):
                key = (variant, batch)
                try:
                    cfg = TrainConfig(batch_size=batch)
                    tr = Trainer(
                        "res34", cfg, steps_per_epoch=steps,
                        compute_dtype=jnp.bfloat16,
                    )
                    rng = np.random.RandomState(0)
                    n = batch * steps
                    imgs = rng.randint(0, 256, (n, 512, 512, 3), np.uint8)
                    labs = np.where(
                        rng.rand(n, 512, 512) < 0.3, 255, 0
                    ).astype(np.uint8)
                    di, dl = tr.stage_dataset(imgs, labs)
                    m = tr.train_epoch_staged(di, dl)  # compile + warm
                    losses = [float(v) for v in np.asarray(m["loss"])[:4]]
                    try:
                        mem = tr._train_step.lower(
                            tr.params, tr.state, tr.opt_state, di[0], dl[0],
                            jnp.asarray(0, jnp.int32),
                        ).compile().memory_analysis()
                        temp = getattr(mem, "temp_size_in_bytes", None)
                    except Exception:
                        temp = None
                    dt = float("inf")
                    for _ in range(2):
                        t0 = time.perf_counter()
                        tr.train_epoch_staged(di, dl)
                        dt = min(dt, time.perf_counter() - t0)
                    results[key] = (n / dt, temp, losses)
                    tgb = f"{temp / 1e9:.2f} GB" if temp else "n/a"
                    print(
                        f"{variant:>12} b{batch:<3}: {n / dt:6.1f} img/s  "
                        f"(step temp {tgb})  first losses "
                        f"{['%.4f' % l for l in losses]}",
                        flush=True,
                    )
                    del tr, di, dl
                except Exception as e:
                    msg = str(e)
                    oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                    results[key] = (None, None, None)
                    print(
                        f"{variant:>12} b{batch:<3}: "
                        f"{'OOM' if oom else 'ERROR'} "
                        f"({msg.splitlines()[0][:120]})",
                        flush=True,
                    )
        finally:
            L.batch_norm = stock_bn

    print("\nsummary (img/s @ batch):")
    for variant in ("stock", "bf16-affine"):
        row = []
        for batch in (8, 16, 24):
            tps = results.get((variant, batch), (None,))[0]
            row.append(f"b{batch}={tps:.1f}" if tps else f"b{batch}=OOM/ERR")
        print(f"  {variant:>12}: " + "  ".join(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
