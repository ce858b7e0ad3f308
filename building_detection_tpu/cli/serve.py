"""Serving CLI (`/root/reference/buildAPI.py:232-233`: 0.0.0.0:5001)."""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdt-serve", description="HTTP building-detection service (POST /photo)."
    )
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5001)
    p.add_argument("--weights-dir")
    p.add_argument("--root-dir", default=".", help="where receive_file/ and all_result/ live")
    p.add_argument("--batch-tiles", type=int, default=8)
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    p.add_argument(
        "--drain-timeout",
        type=float,
        default=None,
        help="seconds to wait for in-flight requests on SIGTERM before "
        "closing anyway (default: ServeConfig.drain_timeout_s = 300)",
    )
    p.add_argument(
        "--no-bucket",
        action="store_true",
        help="disable bucketed program shapes (bucketing lets mixed upload "
        "sizes share compiled programs; output is bit-identical)",
    )
    p.add_argument(
        "--int8",
        action="store_true",
        help="opt-in int8 MXU pointwise convs (faster Xception members; "
        "NOT mask-parity — docs/ARCHITECTURE.md round 3)",
    )
    p.add_argument(
        "--int8-scales",
        help="JSON calibration scales from pipeline.save_int8_scales; "
        "with --int8 but no file, falls back to dynamic per-call scales "
        "(numerically safe, slower)",
    )
    p.add_argument(
        "--int8-calibration-dir",
        help="directory of representative images to calibrate on at "
        "startup (alternative to --int8-scales)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from building_detection_tpu.core.config import Config
    from building_detection_tpu.infer.pipeline import Pipeline
    from building_detection_tpu.serve.server import serve

    weights = {}
    if args.weights_dir:
        from building_detection_tpu.infer.pipeline import discover_weights

        weights = discover_weights(args.weights_dir)
    from building_detection_tpu.core.config import ServeConfig, TilerConfig

    serve_cfg = ServeConfig()
    if args.drain_timeout is not None:
        import dataclasses

        serve_cfg = dataclasses.replace(
            serve_cfg, drain_timeout_s=args.drain_timeout
        )
    cfg = Config(
        tiler=TilerConfig(bucket_sizes=not args.no_bucket), serve=serve_cfg
    )
    int8_scales = None
    int8_calibration = None
    if args.int8 and args.int8_scales:
        from building_detection_tpu.infer.pipeline import load_int8_scales

        int8_scales = load_int8_scales(args.int8_scales)
    elif args.int8 and args.int8_calibration_dir:
        from building_detection_tpu.utils import io as uio

        names = [
            f
            for f in sorted(os.listdir(args.int8_calibration_dir))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".tif", ".tiff"))
        ]
        int8_calibration = [
            uio.imread_rgb(os.path.join(args.int8_calibration_dir, f))
            for f in names[:4]
        ]
    pipe = Pipeline(
        weights=weights,
        cfg=cfg,
        batch_tiles=args.batch_tiles,
        compute_dtype=jnp.bfloat16 if args.precision == "bf16" else jnp.float32,
        int8_pointwise=512 if args.int8 else False,
        int8_calibration=int8_calibration,
        int8_scales=int8_scales,
    )
    print("模型加载完成 (models loaded)")
    serve(pipe, cfg, root_dir=args.root_dir, host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
