"""Checkpoint store + Keras .h5 importer."""
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.nn import layers as L
from building_detection_tpu.train import checkpoint as ckpt


def small_model(s, x):
    x = L.conv2d(s, x, 4, 3)
    x = L.batch_norm(s, x)
    x = L.conv2d_transpose(s, x, 2, 2, strides=2)
    x = L.separable_conv2d(s, x, 3, 3)
    return x


def init_small():
    return M.init(small_model, jax.random.key(0), jnp.zeros((1, 8, 8, 3)))


class TestNpzCheckpoint:
    def test_roundtrip(self, tmp_path):
        params, state = init_small()
        path = str(tmp_path / "c.npz")
        ckpt.save_variables(path, params, state, opt_state=None, step=7,
                            metadata={"model": "small"})
        p2, s2, opt, step, meta = ckpt.load_variables(path)
        assert step == 7 and meta == {"model": "small"} and opt is None
        assert set(p2) == set(params) and set(s2) == set(state)
        for k in params:
            np.testing.assert_array_equal(p2[k], np.asarray(params[k]))

    def test_atomic_write_no_tmp_left(self, tmp_path):
        params, state = init_small()
        path = str(tmp_path / "c.npz")
        ckpt.save_variables(path, params, state)
        assert not os.path.exists(path + ".tmp")


def write_keras_h5(path, layers):
    """Keras weights-only .h5 layout: model_weights/<layer>/<weight path>."""
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        g.attrs["layer_names"] = [name.encode() for name, _ in layers]
        for name, weights in layers:
            lg = g.create_group(name)
            lg.attrs["weight_names"] = [wn.encode() for wn, _ in weights]
            for wn, arr in weights:
                lg.create_dataset(wn, data=arr)


class TestH5Import:
    def test_ordered_shape_matching(self, tmp_path):
        params, state = init_small()
        rng = np.random.RandomState(0)
        # fabricate reference weights with the Keras naming/layout
        fake = {
            k: rng.randn(*np.shape(v)).astype(np.float32)
            for k, v in {**params, **state}.items()
        }
        layers = [
            ("conv2d", [
                ("conv2d/kernel:0", fake["conv2d/kernel"]),
                ("conv2d/bias:0", fake["conv2d/bias"]),
            ]),
            ("batch_normalization", [
                ("batch_normalization/gamma:0", fake["batch_normalization/gamma"]),
                ("batch_normalization/beta:0", fake["batch_normalization/beta"]),
                ("batch_normalization/moving_mean:0", fake["batch_normalization/moving_mean"]),
                ("batch_normalization/moving_variance:0", fake["batch_normalization/moving_variance"]),
            ]),
            ("conv2d_transpose", [
                ("conv2d_transpose/kernel:0", fake["conv2d_transpose/kernel"]),
                ("conv2d_transpose/bias:0", fake["conv2d_transpose/bias"]),
            ]),
            ("separable_conv2d", [
                ("separable_conv2d/depthwise_kernel:0", fake["separable_conv2d/depthwise_kernel"]),
                ("separable_conv2d/pointwise_kernel:0", fake["separable_conv2d/pointwise_kernel"]),
                ("separable_conv2d/bias:0", fake["separable_conv2d/bias"]),
            ]),
        ]
        path = str(tmp_path / "w.h5")
        write_keras_h5(path, layers)

        new_params, new_state = ckpt.import_h5_weights(path, params, state)
        for k in params:
            np.testing.assert_array_equal(new_params[k], fake[k])
        for k in state:
            np.testing.assert_array_equal(new_state[k], fake[k])

    def test_forward_changes_after_import(self, tmp_path):
        """Imported weights actually flow into the forward pass."""
        params, state = init_small()
        x = jnp.ones((1, 8, 8, 3))
        before, _ = M.apply(small_model, params, state, x)
        fake_layers = [("conv2d", [("conv2d/kernel:0",
                                    np.full((3, 3, 3, 4), 0.5, np.float32))])]
        path = str(tmp_path / "w.h5")
        write_keras_h5(path, fake_layers)
        new_params, new_state = ckpt.import_h5_weights(path, params, state)
        after, _ = M.apply(small_model, new_params, new_state, x)
        assert not np.allclose(np.asarray(before), np.asarray(after))
