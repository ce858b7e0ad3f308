"""Batch prediction CLI — the `predict.py` entry point, with flags instead of
hard-coded Windows paths (`/root/reference/predict.py:135-181`).

Mode '1' (single image) == `--image`; mode '2' (directory) == `--image-dir`.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdt-predict",
        description="5-model ensemble building detection over GeoTIFF/PNG scenes.",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--image", help="single image to predict (reference mode '1')")
    src.add_argument(
        "--image-dir", help="directory of images to predict (reference mode '2')"
    )
    p.add_argument("--out", required=True, help="result directory")
    p.add_argument(
        "--weights-dir",
        help="directory with {model}.npz checkpoints (res34/hrnet/v3plus/scse/bam); "
        "missing models run with random weights",
    )
    p.add_argument("--batch-tiles", type=int, default=8)
    p.add_argument(
        "--precision",
        choices=["bf16", "f32"],
        default="bf16",
        help="activation dtype: bf16 for speed, f32 for bit-parity",
    )
    p.add_argument(
        "--keep-intermediates",
        action="store_true",
        help="keep per-model masks (the reference deletes them, predict.py:174-178)",
    )
    p.add_argument(
        "--fast-vote",
        action="store_true",
        help="skip the reference's per-model morphological cleanup and write "
        "the plain on-device 3-of-5 vote (faster; NOT mask-parity)",
    )
    p.add_argument("--config", help="JSON config overriding the reference constants")
    p.add_argument(
        "--int8",
        action="store_true",
        help="opt-in int8 MXU pointwise convs, calibrated on the input "
        "scenes (faster on the Xception members; NOT mask-parity — "
        "docs/ARCHITECTURE.md round 3)",
    )
    p.add_argument(
        "--bucket",
        action="store_true",
        help="bucket program shapes so mixed scene sizes share compiled "
        "programs (bit-identical output)",
    )
    p.add_argument(
        "--num-processes",
        type=int,
        default=1,
        help="fleet-scale inference: total number of bdt-predict processes "
        "sharing this --image-dir.  Each process takes a deterministic "
        "shard of the sorted scene list (no coordination or collectives "
        "needed; per-scene output dirs are disjoint, so the union of all "
        "processes' outputs is bit-identical to one big run — except under "
        "--int8, which calibrates on each shard's own first scenes and is "
        "not mask-parity to begin with).  The reference is single-process "
        "only (predict.py:160-178).",
    )
    p.add_argument(
        "--process-id",
        type=int,
        default=0,
        help="this process's shard index in [0, --num-processes)",
    )
    p.add_argument(
        "--chunk-scenes",
        type=int,
        default=16,
        help="decode/predict/write this many scenes at a time: host memory "
        "stays O(chunk) over arbitrarily large --image-dir runs (the "
        "reference's file bus is O(1 image), predict.py:160-178) while "
        "each chunk still fills grouped device dispatches; 0 = one chunk",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from building_detection_tpu.core.config import Config
    from building_detection_tpu.infer.pipeline import Pipeline
    from building_detection_tpu.models.registry import ENSEMBLE_ORDER

    cfg = Config.from_json(args.config) if args.config else Config()
    if args.bucket:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, tiler=dataclasses.replace(cfg.tiler, bucket_sizes=True)
        )
    weights = {}
    if args.weights_dir:
        from building_detection_tpu.infer.pipeline import discover_weights

        weights = discover_weights(args.weights_dir)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    if args.image:
        images = [args.image]
    else:
        images = [
            os.path.join(args.image_dir, f)
            for f in sorted(os.listdir(args.image_dir))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp"))
        ]
    if args.num_processes < 1 or not (0 <= args.process_id < args.num_processes):
        print(
            f"--process-id {args.process_id} must be in [0, "
            f"--num-processes={args.num_processes})",
            file=sys.stderr,
        )
        return 2
    if args.num_processes > 1:
        if args.image:
            print(
                "--num-processes applies to --image-dir runs (a single "
                "--image has nothing to shard)",
                file=sys.stderr,
            )
            return 2
        # deterministic round-robin over the SORTED list: every process
        # derives the same global order, so shards are disjoint and
        # exhaustive with zero coordination
        total = len(images)
        images = images[args.process_id :: args.num_processes]
        print(
            f"process {args.process_id}/{args.num_processes}: "
            f"{len(images)} of {total} scenes",
            file=sys.stderr,
        )
        if not images and total:
            # more processes than scenes: an empty shard is a clean no-op,
            # not an error — the fleet's union is still complete
            return 0
    if not images:
        print("no images found", file=sys.stderr)
        return 2

    from building_detection_tpu.utils import io as uio

    # the first scenes double as the int8 calibration set
    calib = (
        [uio.imread_rgb(p) for p in images[:2]] if args.int8 else None
    )
    pipe = Pipeline(
        weights=weights, cfg=cfg, batch_tiles=args.batch_tiles,
        # 512 = min input channels: quantize only the large-K Xception
        # projections (every-site quantization raises peak HBM and loses
        # to bf16 — docs/ARCHITECTURE.md round 3)
        compute_dtype=dtype, int8_pointwise=512 if args.int8 else False,
        int8_calibration=calib,
    )

    def predict_chunk(arrays):
        if args.fast_vote:
            from building_detection_tpu.post import edges as E_mod
            from building_detection_tpu.infer.pipeline import PredictResult

            results = []
            for arr in arrays:
                fused = pipe.ensemble.predict_vote(arr, cfg.fuse.vote_threshold)
                corners, height = E_mod.extract_polygons(fused, cfg.edge)
                results.append(PredictResult({}, fused, corners, height))
            return results
        return pipe.predict_images(arrays)

    # Decode/predict/write CHUNK scenes at a time: the grouped device path
    # still sees whole chunks (uploads/downloads pipeline within each), but
    # host memory stays O(chunk) instead of O(directory) — the reference
    # holds one image at a time (predict.py:160-178).  A depth-1 prefetch
    # decodes chunk N+1 on a background thread while chunk N is on device,
    # so host PNG decode overlaps device compute across chunk boundaries
    # (within a chunk the engine already pipelines); peak host memory stays
    # O(2·chunk).
    from building_detection_tpu.data.dataset import prefetch

    chunk = args.chunk_scenes if args.chunk_scenes > 0 else len(images)

    def decoded_chunks():
        for lo in range(0, len(images), chunk):
            paths = images[lo : lo + chunk]
            yield paths, [uio.imread_rgb(p) for p in paths]

    for paths, arrays in prefetch(decoded_chunks(), depth=1):
        for path, result in zip(paths, predict_chunk(arrays)):
            name = os.path.splitext(os.path.basename(path))[0]
            out_dir = os.path.join(args.out, name)
            os.makedirs(out_dir, exist_ok=True)
            if args.keep_intermediates:
                for model_name, mask in result.masks.items():
                    uio.imwrite(
                        os.path.join(out_dir, f"{model_name}_{name}.png"), mask
                    )
            uio.imwrite(
                os.path.join(out_dir, f"{name}_result.png"), result.fused
            )
            uio.write_points(
                result.corners, os.path.join(out_dir, f"{name}.txt")
            )
            print(
                json.dumps(
                    {
                        "image": path,
                        "result": os.path.join(out_dir, f"{name}_result.png"),
                        "points": os.path.join(out_dir, f"{name}.txt"),
                        "num_buildings": len(result.corners),
                    }
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
