"""Evaluation CLI: PA/IoU/MIoU/F1 of a checkpoint over an image/label set.

The reference only ever reports these metrics live during ``fit``
(`/root/reference/train_model/res34.py:663-678`); this gives them as a
standalone command, which is what the BASELINE "WHU IoU parity" check needs.
"""
from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdt-eval", description="Evaluate a checkpoint on an image/label dir."
    )
    p.add_argument("model", choices=["res34", "hrnet", "v3plus", "scse", "bam"])
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--precision", choices=["bf16", "f32"], default="f32")
    p.add_argument(
        "--data-parallel", type=int, default=-1,
        help="devices on the data axis; -1 = as many as the batch divides "
        "over (a batch of 2 on an 8-device host must not shard 8 ways)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from building_detection_tpu.core.config import TrainConfig
    from building_detection_tpu.data.dataset import batch_iterator, list_pairs
    from building_detection_tpu.train.trainer import Trainer

    pairs = list_pairs(args.images, args.labels)
    steps = max(len(pairs) // args.batch_size, 1)
    cfg = TrainConfig(batch_size=args.batch_size, image_size=args.image_size)
    from building_detection_tpu.parallel.mesh import make_mesh

    trainer = Trainer(
        args.model,
        cfg,
        steps_per_epoch=steps,
        mesh=make_mesh(data=args.data_parallel, batch_size=args.batch_size),
        compute_dtype=jnp.bfloat16 if args.precision == "bf16" else jnp.float32,
    )
    trainer.restore(args.checkpoint)

    it = batch_iterator(pairs, args.batch_size, args.image_size)
    agg = {}
    for _ in range(steps):
        m = trainer.eval_on_batch(*next(it))
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + v
    agg = {k: round(v / steps, 6) for k, v in agg.items()}
    # whole batches only, like the reference's len//batch validation_steps
    # (`res34.py:673-678`): the tail len%batch samples are not evaluated,
    # so report the count actually seen, not the directory size
    agg["samples"] = min(steps * args.batch_size, len(pairs))
    print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
