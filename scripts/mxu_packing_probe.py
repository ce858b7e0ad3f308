"""Measure the two unexhausted MXU-packing levers (round-4 VERDICT item 2).

(A) hrnet channel-group packing: the 32-channel 256^2 branch chains
    (`/root/reference/predict_model/hrnet.py:70-96`) fill only 32/128 MXU
    lanes.  Fold k tiles batch->channels: x (B,H,W,32) -> (B/k,H,W,32k) and
    run ONE grouped conv with ``feature_group_count=k`` whose kernel is the
    32->32 kernel tiled k times (grouped conv IS the block-diagonal form).
    Same FLOPs, k-times the lane fill.  Measured as:
      (a1) stock NHWC chain (baseline, = hrnet_limiters_probe 1a);
      (a2) packed chain, pure (pack/unpack outside the timed region);
      (a3) packed chain with the pack/unpack transposes INSIDE (what an
           integration pays at the branch segment edges).

(B) depthwise-as-grouped-MXU: the Xception separable convs
    (`/root/reference/predict_model/v3plus.py:185-280`) run their 3x3
    depthwise stage on the VPU (feature_group_count=C, 1 channel/group).
    Re-express as feature_group_count=C/g with a block-diagonal (3,3,g,C)
    kernel (true depthwise values on the diagonal, zeros elsewhere): g-times
    redundant FLOPs, but on the MXU.  If the g=1 form is layout- or
    VPU-bound rather than FLOP-bound, some g may win.  Measured at the
    middle-flow shape (32^2 x 728ch, where 48 of these run per tile) and the
    entry shape (128^2 x 128ch), each vs the pointwise-dominated full
    sep-conv block.

Usage: python scripts/mxu_packing_probe.py [a|b]   (default: both)
Prints a table; conclusions go to BASELINE.md / docs/ARCHITECTURE.md.
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

    which = sys.argv[1] if len(sys.argv) > 1 else "ab"

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

    dn = ("NHWC", "HWIO", "NHWC")

    if "a" in which:
        B, H, W, C = 128, 256, 256, 32
        DEPTH = 8
        k32 = jax.random.normal(
            jax.random.key(0), (3, 3, C, C), jnp.bfloat16
        ) * 0.1
        x = jax.random.normal(jax.random.key(1), (B, H, W, C), jnp.bfloat16)
        flops = 2 * 9 * C * C * H * W * B * DEPTH

        @jax.jit
        def chain_nhwc(x, k):
            for _ in range(DEPTH):
                x = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=dn
                )
                x = jnp.maximum(x, 0)
            return jnp.sum(x.astype(jnp.float32))

        dt = time_fn(chain_nhwc, x, k32)
        print(f"(a1) NHWC 32ch chain (baseline):      {dt * 1e3:7.2f} ms  "
              f"{flops / dt / 1e12:6.1f} TF/s", flush=True)

        for pack in (2, 4, 8):
            kg = jnp.tile(k32, (1, 1, 1, pack))  # (3,3,32,32*pack): grouped
            b = B // pack

            def packed_chain(xp, kg, pack=pack):
                for _ in range(DEPTH):
                    xp = jax.lax.conv_general_dilated(
                        xp, kg, (1, 1), "SAME", dimension_numbers=dn,
                        feature_group_count=pack,
                    )
                    xp = jnp.maximum(xp, 0)
                return xp

            @jax.jit
            def pure(xp, kg):
                return jnp.sum(packed_chain(xp, kg).astype(jnp.float32))

            @jax.jit
            def with_edges(x, kg, pack=pack):
                xp = x.reshape(b, pack, H, W, C).transpose(0, 2, 3, 1, 4)
                xp = xp.reshape(b, H, W, pack * C)
                xp = packed_chain(xp, kg)
                xu = xp.reshape(b, H, W, pack, C).transpose(0, 3, 1, 2, 4)
                return jnp.sum(xu.astype(jnp.float32))

            xp0 = (
                x.reshape(b, pack, H, W, C)
                .transpose(0, 2, 3, 1, 4)
                .reshape(b, H, W, pack * C)
            )
            dt_p = time_fn(pure, xp0, kg)
            dt_e = time_fn(with_edges, x, kg)
            print(
                f"(a2) packed k={pack} pure:             {dt_p * 1e3:7.2f} ms  "
                f"{flops / dt_p / 1e12:6.1f} TF/s", flush=True,
            )
            print(
                f"(a3) packed k={pack} incl. edges:      {dt_e * 1e3:7.2f} ms  "
                f"{flops / dt_e / 1e12:6.1f} TF/s", flush=True,
            )

    if "b" in which:
        for B, HW, C in (
            (128, 32, 728),   # middle flow x48 (`v3plus.py:239-252`)
            (128, 128, 128),  # entry block 1 (`v3plus.py:185-194`)
            (128, 64, 256),   # entry block 2 (`v3plus.py:202-214`)
            (128, 32, 1536),  # exit flow (`v3plus.py:258-282`)
        ):
            print(f"-- sep-conv site ({B},{HW},{HW},{C}) --", flush=True)
            x = jax.random.normal(
                jax.random.key(2), (B, HW, HW, C), jnp.bfloat16
            )
            kdw = jax.random.normal(
                jax.random.key(3), (3, 3, 1, C), jnp.bfloat16
            ) * 0.1
            kpw = jax.random.normal(
                jax.random.key(4), (1, 1, C, C), jnp.bfloat16
            ) * 0.1
            dw_flops = 2 * 9 * C * HW * HW * B

            @jax.jit
            def depthwise(x, k):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=dn,
                    feature_group_count=C,
                )
                return jnp.sum(y.astype(jnp.float32))

            dt0 = time_fn(depthwise, x, kdw)
            print(f"  depthwise g=1 (VPU):     {dt0 * 1e3:7.3f} ms  "
                  f"useful {dw_flops / dt0 / 1e12:5.2f} TF/s", flush=True)

            for g in (2, 4, 7, 8, 13, 14, 16, 28):
                if C % g:
                    continue
                # block-diagonal (3,3,g,C): out channel c uses input group
                # c//g; its diagonal entry holds the depthwise value
                kb = np.zeros((3, 3, g, C), np.float32)
                kd = np.asarray(kdw, np.float32)
                for c in range(C):
                    kb[:, :, c % g, c] = kd[:, :, 0, c]
                kb = jnp.asarray(kb, jnp.bfloat16)

                @jax.jit
                def grouped(x, kb, g=g):
                    y = jax.lax.conv_general_dilated(
                        x, kb, (1, 1), "SAME", dimension_numbers=dn,
                        feature_group_count=C // g,
                    )
                    return jnp.sum(y.astype(jnp.float32))

                dt = time_fn(grouped, x, kb)
                print(f"  block-diag g={g:<2} (MXU):   {dt * 1e3:7.3f} ms  "
                      f"useful {dw_flops / dt / 1e12:5.2f} TF/s  "
                      f"({dt / dt0:4.2f}x vs depthwise)", flush=True)

            if C <= 256:  # dense diagonal at 728 is 728x the FLOPs — skip
                kdense = np.zeros((3, 3, C, C), np.float32)
                kd = np.asarray(kdw, np.float32)
                for c in range(C):
                    kdense[:, :, c, c] = kd[:, :, 0, c]
                kdense = jnp.asarray(kdense, jnp.bfloat16)

                @jax.jit
                def dense(x, k):
                    y = jax.lax.conv_general_dilated(
                        x, k, (1, 1), "SAME", dimension_numbers=dn
                    )
                    return jnp.sum(y.astype(jnp.float32))

                dt = time_fn(dense, x, kdense)
                print(f"  dense diagonal (MXU):    {dt * 1e3:7.3f} ms  "
                      f"useful {dw_flops / dt / 1e12:5.2f} TF/s  "
                      f"({dt / dt0:4.2f}x vs depthwise)", flush=True)

            # context: the full sep-conv block (dw + pw), XLA-fused
            @jax.jit
            def sep_block(x, kd_, kp):
                y = jax.lax.conv_general_dilated(
                    x, kd_, (1, 1), "SAME", dimension_numbers=dn,
                    feature_group_count=C,
                )
                y = jax.lax.conv_general_dilated(
                    y, kp, (1, 1), "SAME", dimension_numbers=dn
                )
                return jnp.sum(y.astype(jnp.float32))

            dt_blk = time_fn(sep_block, x, kdw, kpw)
            pw_flops = 2 * C * C * HW * HW * B
            print(f"  full sep block dw+pw:    {dt_blk * 1e3:7.3f} ms  "
                  f"total {(dw_flops + pw_flops) / dt_blk / 1e12:5.2f} TF/s  "
                  f"(dw share if serial: {dt0 / dt_blk * 100:4.1f}%)",
                  flush=True)

    if "c" in which:
        # (C) in-CONTEXT depthwise share: an 8-block middle-flow-style chain
        # (sep conv + residual relu, as `v3plus.py:239-252`) lets XLA fuse
        # across ops the way the real model does; comparing against the same
        # chain with the depthwise stage removed isolates what the depthwise
        # costs IN SITU (the isolated single-op number above is layout-cold
        # and overstates it — v3plus' overall 44.7% MFU is incompatible with
        # a 70% depthwise share).
        B, HW, C = 128, 32, 728
        x = jax.random.normal(jax.random.key(5), (B, HW, HW, C), jnp.bfloat16)
        kdw = jax.random.normal(
            jax.random.key(6), (3, 3, 1, C), jnp.bfloat16
        ) * 0.05
        kpw = jax.random.normal(
            jax.random.key(7), (1, 1, C, C), jnp.bfloat16
        ) * 0.05
        DEPTH = 8
        pw_flops = 2 * C * C * HW * HW * B * DEPTH

        @jax.jit
        def chain_sep(x, kdw, kpw):
            for _ in range(DEPTH):
                y = jax.lax.conv_general_dilated(
                    x, kdw, (1, 1), "SAME", dimension_numbers=dn,
                    feature_group_count=C,
                )
                y = jax.lax.conv_general_dilated(
                    y, kpw, (1, 1), "VALID", dimension_numbers=dn
                )
                x = jnp.maximum(x + y, 0)
            return jnp.sum(x.astype(jnp.float32))

        @jax.jit
        def chain_pw(x, kpw):
            for _ in range(DEPTH):
                y = jax.lax.conv_general_dilated(
                    x, kpw, (1, 1), "VALID", dimension_numbers=dn
                )
                x = jnp.maximum(x + y, 0)
            return jnp.sum(x.astype(jnp.float32))

        dt_sep = time_fn(chain_sep, x, kdw, kpw)
        dt_pw = time_fn(chain_pw, x, kpw)
        share = (dt_sep - dt_pw) / dt_sep * 100
        print(f"(c) 8-block chain WITH dw:  {dt_sep * 1e3:7.2f} ms  "
              f"pw-only {pw_flops / dt_sep / 1e12:5.1f} TF/s", flush=True)
        print(f"(c) 8-block chain pw-only:  {dt_pw * 1e3:7.2f} ms  "
              f"{pw_flops / dt_pw / 1e12:5.1f} TF/s  "
              f"-> in-context dw share {share:4.1f}%", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
