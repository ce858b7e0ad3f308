"""One-model TF-oracle parity probe: weight interchange in BOTH directions.

Usage: python scripts/tf_oracle_probe.py <res34|scse|v3plus|bam|hrnet> [size]

Forward direction (the reference's deployment path, `predict.py:17-54`):
builds the reference model verbatim under real tf_keras, saves its weights
.h5, strict-imports them into our JAX model, and compares the f32 forward on
a fixed random input.

Reverse direction (migrating BACK: train here, deploy into the existing TF
stack): exports the same values through our ``export_h5_weights`` (the
``bdt-convert`` writer), zeroes the live reference model, has REAL tf_keras
``model.load_weights`` consume our file, and demands the TF forward return
bit-identically — proving our .h5 layout/grouping/ordering is one Keras
itself accepts, not merely one our own importer round-trips.

Run one model per process (Keras name counters are process-global).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import tf_oracle  # noqa: E402  (sets TF_USE_LEGACY_KERAS first)

import numpy as np  # noqa: E402


def main():
    name = sys.argv[1]
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import tempfile

    import tensorflow as tf  # noqa: F401

    fd, h5 = tempfile.mkstemp(suffix=f"_{name}.h5")
    os.close(fd)
    model = tf_oracle.export_reference_weights(name, h5)
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
    y_tf = model.predict(x, verbose=0)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from building_detection_tpu.core import module as M
    from building_detection_tpu.models.registry import MODEL_REGISTRY, init_model
    from building_detection_tpu.train import checkpoint as ckpt

    params, state = init_model(name, jax.random.key(0), (1, size, size, 3))
    params, state, report = ckpt.import_h5_weights(h5, params, state, strict=True)
    print(report.summary())
    fn = MODEL_REGISTRY[name]
    y_jax, _ = jax.jit(lambda p, s, xx: M.apply(fn, p, s, xx))(
        params, state, jnp.asarray(x)
    )
    y_jax = np.asarray(y_jax)
    md = float(np.abs(y_jax - y_tf).max())
    dis = y_jax.argmax(-1) != y_tf.argmax(-1)
    agree = 1.0 - float(dis.mean())
    # argmax can legitimately flip where TF's own class margin is below the
    # cross-framework float error (random-init weights sit near p=0.5);
    # only disagreements at a REAL margin indicate semantic divergence
    margin = np.abs(y_tf[..., 1] - y_tf[..., 0])
    real_dis = int((dis & (margin > 1e-4)).sum())
    print(
        f"{name}: max|diff|={md:.3e} argmax_agree={agree:.6f} "
        f"disagreements_above_margin={real_dis}"
    )
    assert md < 1e-4 and real_dis == 0, f"{name} FAILED"

    # -- reverse direction: real Keras loads OUR exported .h5 ---------------
    from building_detection_tpu.models.registry import keras_layer_order

    fd, h5_back = tempfile.mkstemp(suffix=f"_{name}_ours.h5")
    os.close(fd)
    ckpt.export_h5_weights(
        h5_back,
        {k: np.asarray(v) for k, v in params.items()},
        {k: np.asarray(v) for k, v in state.items()},
        layer_order=keras_layer_order(name),
    )
    # wipe the live model so a silent no-op load cannot pass (positive
    # values keep BN moving variances valid)
    rs = np.random.RandomState(1)
    model.set_weights(
        [rs.uniform(0.02, 0.2, w.shape).astype(w.dtype) for w in model.get_weights()]
    )
    wiped = model.predict(x, verbose=0)
    # the wiped forward may be wildly different or even NaN — all that
    # matters is that it is NOT the original, so a no-op load cannot pass
    assert not np.array_equal(wiped, y_tf), "wipe did not change the model"
    model.load_weights(h5_back)  # real tf_keras consuming OUR file
    y_tf_back = model.predict(x, verbose=0)
    back_md = float(np.abs(y_tf_back - y_tf).max())
    print(f"{name}: reverse (tf_keras loads our .h5) max|diff|={back_md:.3e}")
    assert back_md == 0.0, f"{name} reverse interchange FAILED"
    print(f"{name}: PASS (forward + reverse)")


if __name__ == "__main__":
    main()
