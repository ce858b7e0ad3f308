"""Checkpoint converter: our ``.npz`` checkpoints <-> reference Keras ``.h5``.

The reference's deployment format is weights-only Keras ``.h5``
(`/root/reference/predict.py:17-54`); our trainer writes ``.npz`` with
optimizer state for exact resume.  This CLI bridges the two so a user can

* bring reference-trained ``.h5`` weights into the npz world once
  (``bdt-convert res34 resnet34.h5 res34.npz``), or
* export weights trained here back to the reference's own tooling
  (``bdt-convert res34 epoch_30_weights.npz res34.h5`` loads verbatim in
  ``tf_keras`` — layout parity pinned by ``tests/test_tf_oracle.py``).

Direction is inferred from the file extensions.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdt-convert",
        description="Convert model weights between our .npz checkpoints and "
        "reference-format Keras .h5 (direction from extensions).",
    )
    p.add_argument("model", choices=["res34", "hrnet", "v3plus", "scse", "bam"])
    p.add_argument("src", help="source weights (.h5/.hdf5 or .npz)")
    p.add_argument("dst", help="destination (.npz or .h5/.hdf5)")
    p.add_argument(
        "--image-size", type=int, default=512,
        help="input size used to build the target model for .h5 import "
        "(weight shapes are size-independent; the default always works)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    h5_exts = (".h5", ".hdf5")
    src_h5 = args.src.endswith(h5_exts)
    dst_h5 = args.dst.endswith(h5_exts)
    if src_h5 == dst_h5:
        raise SystemExit(
            f"exactly one of src/dst must be .h5 (got {args.src!r} -> {args.dst!r})"
        )

    import jax

    from building_detection_tpu.models.registry import init_model
    from building_detection_tpu.train import checkpoint as ckpt

    params, state = init_model(
        args.model, jax.random.key(0), (1, args.image_size, args.image_size, 3)
    )
    if src_h5:
        params, state, report = ckpt.import_h5_weights(
            args.src, jax.device_get(params), jax.device_get(state), strict=True
        )
        print(f"[convert] {args.model}: {report.summary()}")
        ckpt.save_variables(
            args.dst, params, state, metadata={"model": args.model}
        )
    else:
        loaded_params, loaded_state, _, _, _ = ckpt.load_variables(args.src)
        # structural check against the named model, so a wrong-model npz
        # fails loudly here instead of producing an unloadable .h5
        try:
            # shapes only — no device fetch of the template weights
            ckpt.check_matches_model(
                args.src, loaded_params, loaded_state, params, state, args.model
            )
        except ValueError as e:
            raise SystemExit(str(e))
        from building_detection_tpu.models.registry import keras_layer_order

        # canonical Keras depth-order so the reference's POSITIONAL
        # model.load_weights accepts the file (see export_h5_weights)
        ckpt.export_h5_weights(
            args.dst, loaded_params, loaded_state,
            layer_order=keras_layer_order(args.model),
        )
    print(f"[convert] wrote {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
