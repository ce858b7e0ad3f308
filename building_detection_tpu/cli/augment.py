"""Dataset augmentation CLI (`/root/reference/data_enhancement.py:220-234`)."""
from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdt-augment",
        description="Offline augmentation + 9:1 train/val split (reference recipe).",
    )
    p.add_argument("--images", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--out-images", required=True)
    p.add_argument("--out-labels", required=True)
    p.add_argument("--split-dir", help="if set, write train/val split under this dir")
    p.add_argument("--split-rate", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--copy-paste",
        action="store_true",
        help="also run the instance-transplant augmentation the reference "
        "describes but never implemented (data_enhancement.py:17-21): "
        "buildings from (7.5%%, 20%%]-coverage donors are copied into "
        "<=7.5%%-coverage recipients",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from building_detection_tpu.data.augment import DatasetBuilder

    t0 = time.time()
    builder = DatasetBuilder(
        args.images, args.labels, args.out_images, args.out_labels, seed=args.seed
    )
    n = builder.run()
    print(f"wrote {n} augmented pairs in {time.time() - t0:.1f}s")
    if args.copy_paste:
        n_cp = builder.run_copy_paste()
        print(f"wrote {n_cp} copy-paste transplant pairs")
    if args.split_dir:
        import os

        counts = builder.split_train_val(
            os.path.join(args.split_dir, "train/images"),
            os.path.join(args.split_dir, "train/labels"),
            os.path.join(args.split_dir, "val/images"),
            os.path.join(args.split_dir, "val/labels"),
            args.split_rate,
        )
        print(f"split: {counts[0]} train / {counts[1]} val")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
