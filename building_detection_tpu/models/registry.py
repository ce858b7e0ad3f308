"""Model zoo registry.

Keys match the ensemble member names used by the reference pipeline
(``res34_/hrnet_/v3plus_/scse_/bam_`` prefixes, `/root/reference/predict.py:76`),
and `ENSEMBLE_ORDER` preserves the reference's execution order
(`/root/reference/predict.py:78-87`).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from building_detection_tpu.core import module as M
from building_detection_tpu.models.hrnet import hrnet
from building_detection_tpu.models.res34_unet import res34_unet
from building_detection_tpu.models.scse_unet import scse_unet
from building_detection_tpu.models.xception_deeplab import deeplab_v3p, deeplab_v3p_bam

ModelFn = Callable[..., jax.Array]

MODEL_REGISTRY: Dict[str, ModelFn] = {
    "res34": res34_unet,
    "hrnet": hrnet,
    "v3plus": deeplab_v3p,
    "scse": scse_unet,
    "bam": deeplab_v3p_bam,
}

# Execution order of the reference ensemble (`/root/reference/predict.py:78-87`).
ENSEMBLE_ORDER = ("res34", "hrnet", "v3plus", "scse", "bam")

# Alphabetical (glob) order the reference's fusion reads masks in
# (`/root/reference/model_fuse.py:278`).
FUSION_GLOB_ORDER = ("bam", "hrnet", "res34", "scse", "v3plus")


def get_model(name: str) -> ModelFn:
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None


def keras_layer_order(name: str) -> list:
    """Canonical tf_keras ``model.layers`` order (weight-bearing subsequence)
    for one zoo model, with fresh-process name counters.

    Keras' positional ``model.load_weights(h5)`` pairs the file's layer
    groups with ``model.layers`` BY POSITION, and for functional models that
    order is graph depth order, not instantiation order (a residual block's
    main-path convs enumerate before its shortcut conv).  Our pytrees are
    keyed in instantiation order, so ``export_h5_weights`` needs this list to
    write an ``.h5`` the UNMODIFIED reference stack (`predict.py:17-54`)
    loads positionally.  Extracted once from the real reference models under
    tf_keras 2.21 (``scripts/gen_keras_layer_order.py``) and checked in as
    derived behavioral-contract data — the same category as the param
    fingerprints in tests/test_models.py.
    """
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "keras_layer_order.json")
    with open(path) as f:
        orders = json.load(f)
    try:
        return orders[name]
    except KeyError:
        raise ValueError(
            f"no canonical Keras layer order for {name!r}; "
            f"available: {sorted(orders)}"
        ) from None


def init_model(
    name: str,
    rng: jax.Array,
    input_shape: Tuple[int, int, int, int] = (1, 512, 512, 3),
    dtype=jnp.float32,
):
    """Initialise (params, state) for a zoo model on an example input shape."""
    fn = get_model(name)
    x = jax.ShapeDtypeStruct(input_shape, dtype)
    return M.init(fn, rng, x, dtype=dtype)
