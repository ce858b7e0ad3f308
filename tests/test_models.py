"""Model zoo structural tests.

Pins each model's trainable-parameter count (architecture fingerprint) and
checks the (B, H, W, 2) softmax contract shared by all five reference models
(`/root/reference/predict.py:109-110` expects softmax output, argmax last axis).

The strongest parity anchor: the reference documents its Res34 encoder at
22,910,272 trainable params (`/root/reference/predict_model/res34.py:164`) and
our encoder reproduces it exactly.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.models import res34_unet as R
from building_detection_tpu.models.registry import MODEL_REGISTRY
from building_detection_tpu.models.registry import init_model as _init_model


@functools.lru_cache(maxsize=None)
def init_model(name, _key=0, input_shape=(1, 32, 32, 3)):
    return _init_model(name, jax.random.key(_key), input_shape)

# Architecture fingerprints (trainable params), measured once at build time.
EXPECTED_PARAMS = {
    "res34": 38_519_778,
    "hrnet": 9_588_226,
    "v3plus": 64_509_482,
    "scse": 34_558_914,
    "bam": 62_863_400,
}

EXPECTED_STATE = {
    "res34": 25_536,
    "hrnet": 19_584,
    "v3plus": 106_192,
    "scse": 0,
    "bam": 105_770,
}


def test_res34_encoder_matches_reference_param_count():
    """`res34.py:164` documents 22,910,272 trainable params for the encoder."""
    x = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)
    params, _ = M.init(R._encoder, jax.random.key(0), x)
    assert M.param_count(params) == 22_910_272


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_param_count_fingerprint(name):
    params, state = init_model(name)
    assert M.param_count(params) == EXPECTED_PARAMS[name]
    assert M.state_count(state) == EXPECTED_STATE[name]


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_softmax_contract(name):
    """(B,H,W,3) -> (B,H,W,2), rows sum to 1 (softmax head)."""
    fn = MODEL_REGISTRY[name]
    params, state = init_model(name)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), minval=-1, maxval=1)
    f = jax.jit(lambda p, st, xx: M.apply(fn, p, st, xx)[0])
    y = np.asarray(f(params, state, x))
    assert y.shape == (2, 32, 32, 2)
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-4)
    assert (y >= 0).all()


def test_shape_polymorphic():
    """Params initialised at one size apply at another (fully convolutional)."""
    fn = MODEL_REGISTRY["res34"]
    params, state = init_model("res34")
    x = jnp.zeros((1, 64, 64, 3))
    y, _ = jax.jit(lambda p, st, xx: M.apply(fn, p, st, xx))(params, state, x)
    assert y.shape == (1, 64, 64, 2)


def test_train_mode_updates_bn_state():
    fn = MODEL_REGISTRY["res34"]
    params, state = init_model("res34")
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    _, new_state = M.apply(fn, params, state, x, train=True)
    moved = [
        k
        for k in state
        if not np.allclose(np.asarray(state[k]), np.asarray(new_state[k]))
    ]
    assert moved, "training should update BN moving statistics"
