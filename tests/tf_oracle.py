"""Real-TensorFlow oracle: build the reference Keras models VERBATIM.

The image ships TensorFlow 2.21 + tf_keras 2.21; with ``TF_USE_LEGACY_KERAS=1``
the reference model code at `/root/reference/predict_model/*.py` builds
unmodified.  That makes the actual reference — not a hand-derived numpy
emulation — the ground truth for layer semantics, weight-file layout and
forward parity (tests/test_tf_oracle.py).

Import-order contract: ``TF_USE_LEGACY_KERAS`` must be set before tensorflow
is imported anywhere in the process, so this module sets it at import time
and every consumer must import it before (or instead of) tensorflow.
"""
from __future__ import annotations

import importlib.util
import os
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
# oneDNN picks primitives by runtime thread availability and warns that
# results vary with computation order — under a loaded box that makes the
# oracle's forward nondeterministic run to run (res34's max|diff| vs JAX
# measured 5.6e-5..>1e-4 across runs of IDENTICAL code). Disable it so the
# oracle is a fixed point.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

REFERENCE_DIR = "/root/reference/predict_model"

# model key -> (reference file, callable that builds the tf.keras.Model)
_BUILDERS = {
    "res34": ("res34.py", lambda m: m.ResNetFamily().run_model("res34")),
    "scse": ("scse.py", lambda m: m.UNet(2)),
    "v3plus": ("v3plus.py", lambda m: m.Xception_DeepLabV3_Plus()),
    "bam": ("bam.py", lambda m: m.Xception_DeepLabV3_Plus_bam()),
    "hrnet": ("hrnet.py", lambda m: m.HRNet()),
}


def tf_available() -> bool:
    return (
        importlib.util.find_spec("tensorflow") is not None
        and importlib.util.find_spec("tf_keras") is not None
        and os.path.isdir(REFERENCE_DIR)
    )


def _load_reference_module(fname: str):
    """Import a reference predict_model file as an isolated module."""
    path = os.path.join(REFERENCE_DIR, fname)
    modname = f"_reference_oracle_{fname[:-3]}"
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def build_reference_model(name: str):
    """The reference's tf.keras.Model for one zoo member, built verbatim.

    NOTE: Keras layer-name counters are process-global; building two models
    in one process offsets the second's layer names.  Our .h5 importer
    resolves that by ordered (suffix, shape) fallback — which is itself part
    of what the oracle tests exercise.
    """
    fname, builder = _BUILDERS[name]
    # Keras initializers are unseeded: freshly drawn weights every run made
    # parity thresholds a lottery (probe md drifted 5.6e-5..8.1e-5 across
    # runs and once crossed 1e-4 in-suite). Pin the draw.
    import tf_keras

    tf_keras.utils.set_random_seed(0)
    return builder(_load_reference_module(fname))


def export_reference_weights(name: str, h5_path: str):
    """Build the reference model and write its weights-only .h5 (the exact
    artifact `predict.py:17-54` consumes).  Returns the built model."""
    model = build_reference_model(name)
    model.save_weights(h5_path)
    return model
