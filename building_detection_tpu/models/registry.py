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
