"""Training CLI — the `train_model/*.py` scripts as one parameterised entry
point (`/root/reference/train_model/res34.py` x5, identical harnesses)."""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdt-train", description="Train one zoo model with the reference recipe."
    )
    p.add_argument("model", choices=["res34", "hrnet", "v3plus", "scse", "bam"])
    p.add_argument("--train-images", required=True)
    p.add_argument("--train-labels", required=True)
    p.add_argument("--val-images")
    p.add_argument("--val-labels")
    p.add_argument("--checkpoint-dir", default="weights1")
    p.add_argument("--resume", help="checkpoint to resume from (exact, incl. optimizer)")
    p.add_argument(
        "--init-weights",
        help="weights-only init (.h5 or .npz) for transfer learning — the "
        "reference's WHU-pretrained -> fine-tune workflow; optimizer, "
        "schedule and step start fresh (use --resume for exact resume)",
    )
    p.add_argument(
        "--auto-resume",
        action="store_true",
        help="resume from the newest epoch_N_weights.npz in --checkpoint-dir",
    )
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--warmup-epochs", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument(
        "--loss",
        choices=["edge_focal_loss", "focal_loss", "binary_crossentropy"],
        default="edge_focal_loss",
    )
    p.add_argument("--augment-seed", type=int, help="enable on-device augmentation")
    p.add_argument(
        "--shuffle",
        action="store_true",
        help="shuffle the dataset (opt-in; the reference cycles sorted file "
        "order): samples once before staging, batch order every epoch — "
        "deterministic, resume-stable (see Trainer.fit_arrays)",
    )
    p.add_argument("--shuffle-seed", type=int, default=0)
    p.add_argument(
        "--precision", choices=["bf16", "f32"], default="bf16",
        help="activation dtype for the train step",
    )
    p.add_argument("--data-parallel", type=int, default=-1, help="devices on the data axis")
    p.add_argument(
        "--coordinator",
        help="multi-host training: host:port of process 0's coordinator — "
        "launch one bdt-train per host with identical arguments plus "
        "--num-processes/--process-id (on a TPU pod slice pass just "
        "--num-processes 0 to auto-detect the topology); each host decodes "
        "only its shard of the dataset, gradients all-reduce globally, "
        "process 0 writes the checkpoints",
    )
    p.add_argument("--num-processes", type=int)
    p.add_argument("--process-id", type=int)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.coordinator or args.num_processes is not None:
        # must run before anything touches the XLA backend
        from building_detection_tpu.parallel.distributed import init_distributed

        if args.num_processes == 0:  # pod auto-detection
            init_distributed()
        else:
            init_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax.numpy as jnp

    from building_detection_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from building_detection_tpu.core.config import TrainConfig
    from building_detection_tpu.data.dataset import batch_iterator, list_pairs
    from building_detection_tpu.parallel.mesh import make_mesh
    from building_detection_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        lr_base=args.lr,
        loss=args.loss,
        image_size=args.image_size,
    )
    train_pairs = list_pairs(args.train_images, args.train_labels)
    print(f"training samples: {len(train_pairs)}")
    steps = max(len(train_pairs) // cfg.batch_size, 1)
    trainer = Trainer(
        args.model,
        cfg,
        steps_per_epoch=steps,
        mesh=make_mesh(data=args.data_parallel, batch_size=cfg.batch_size),
        compute_dtype=jnp.bfloat16 if args.precision == "bf16" else jnp.float32,
        augment=args.augment_seed is not None,
        augment_seed=args.augment_seed or 0,
    )
    resume_path = args.resume
    if args.auto_resume and not resume_path:
        import glob
        import re

        candidates = glob.glob(os.path.join(args.checkpoint_dir, "epoch_*_weights.npz"))
        if candidates:
            resume_path = max(
                candidates,
                key=lambda p: int(re.search(r"epoch_(\d+)_", p).group(1)),
            )
    if resume_path and args.init_weights:
        raise SystemExit(
            "--init-weights conflicts with --resume/--auto-resume: exact "
            "resume already restores the weights"
        )
    if resume_path:
        trainer.restore(resume_path)
        print(f"resumed from {resume_path} at step {trainer.step}")
    elif args.init_weights:
        trainer.load_weights(args.init_weights)
        print(
            f"initialised weights from {args.init_weights} (fresh optimizer)"
        )

    # Host memory ceiling for decoding the whole dataset up front; past it,
    # stream from disk per step (the staged-HBM decision proper is
    # Trainer.should_stage, made against device memory inside fit_arrays).
    # BDT_HOST_DECODE_BUDGET overrides for smaller/larger hosts (bytes).
    host_budget = int(os.environ.get("BDT_HOST_DECODE_BUDGET", 16 << 30))
    dataset_bytes = len(train_pairs) * (cfg.image_size ** 2) * 4
    if dataset_bytes <= host_budget:
        import jax
        import numpy as np

        from building_detection_tpu.data.dataset import decode_pair

        if jax.process_count() > 1:
            # multi-host: decode only the samples this process's devices own
            # and assemble globally-sharded staged arrays directly
            from building_detection_tpu.parallel import distributed as dist

            idx = dist.local_sample_indices(
                len(train_pairs), cfg.batch_size, trainer.mesh
            )
            if len(idx) == 0:
                raise SystemExit(
                    f"multi-host training needs at least one complete global "
                    f"batch ({cfg.batch_size} samples; got {len(train_pairs)}) "
                    f"and every process must own rows of the data axis"
                )
            print(f"process {jax.process_index()}: feeding {len(idx)} samples")
            local_pairs = [train_pairs[i] for i in idx]
        else:
            local_pairs = train_pairs
        imgs, labs = [], []
        for ip, lp in local_pairs:
            im, lb = decode_pair(ip, lp, cfg.image_size)
            imgs.append(im)
            labs.append(lb)
        images, labels = np.stack(imgs), np.stack(labs)
        if jax.process_count() > 1:
            images, labels = dist.stage_local_dataset(trainer, images, labels)
        val_images = val_labels = None
        if args.val_images and args.val_labels:
            val_pairs = list_pairs(args.val_images, args.val_labels)
            print(f"validation samples: {len(val_pairs)}")
            vi, vl = [], []
            for ip, lp in val_pairs:
                im, lb = decode_pair(ip, lp, cfg.image_size)
                vi.append(im)
                vl.append(lb)
            val_images, val_labels = np.stack(vi), np.stack(vl)
        trainer.fit_arrays(
            images, labels, val_images, val_labels,
            checkpoint_dir=args.checkpoint_dir,
            shuffle=args.shuffle, shuffle_seed=args.shuffle_seed,
        )
        return 0

    from building_detection_tpu.data.dataset import prefetch

    import jax

    multihost = jax.process_count() > 1
    if multihost:
        # stream only this process's rows of each global batch (complete
        # batches; the sub-batch tail is dropped, matching the staged path).
        # The per-pass shuffle stays aligned across processes: every local
        # pair list has the same length, so the seeded permutation is the
        # same on all of them.
        from building_detection_tpu.parallel import distributed as dist

        idx = dist.local_sample_indices(
            len(train_pairs), cfg.batch_size, trainer.mesh
        )
        if len(idx) == 0:
            raise SystemExit(
                f"multi-host streaming needs at least one complete global "
                f"batch ({cfg.batch_size} samples; got {len(train_pairs)}) "
                f"and every process must own rows of the data axis"
            )
        print(f"process {jax.process_index()}: streaming {len(idx)} samples")
        stream_pairs = [train_pairs[i] for i in idx]
        stream_batch = len(idx) // (len(train_pairs) // cfg.batch_size)
    else:
        stream_pairs, stream_batch = train_pairs, cfg.batch_size
    train_iter = prefetch(batch_iterator(
        stream_pairs, stream_batch, cfg.image_size,
        shuffle=args.shuffle, seed=args.shuffle_seed,
    ))
    val_iter, val_steps = None, 0
    if args.val_images and args.val_labels:
        val_pairs = list_pairs(args.val_images, args.val_labels)
        print(f"validation samples: {len(val_pairs)}")
        val_iter = batch_iterator(val_pairs, cfg.batch_size, cfg.image_size)
        val_steps = max(len(val_pairs) // cfg.batch_size, 1)

    trainer.fit(
        train_iter, val_iter, val_steps, checkpoint_dir=args.checkpoint_dir,
        from_process_local=multihost,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
