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


def keras_dw(arr):
    """Our (kh, kw, 1, C) depthwise kernel in Keras' (kh, kw, C, 1) layout —
    what a real SeparableConv2D writes and what the importer must undo."""
    return np.ascontiguousarray(np.transpose(arr, (0, 1, 3, 2)))


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
                ("separable_conv2d/depthwise_kernel:0", keras_dw(fake["separable_conv2d/depthwise_kernel"])),
                ("separable_conv2d/pointwise_kernel:0", fake["separable_conv2d/pointwise_kernel"]),
                ("separable_conv2d/bias:0", fake["separable_conv2d/bias"]),
            ]),
        ]
        path = str(tmp_path / "w.h5")
        write_keras_h5(path, layers)

        new_params, new_state, report = ckpt.import_h5_weights(path, params, state)
        assert report.complete
        for k in params:
            np.testing.assert_array_equal(new_params[k], fake[k])
        for k in state:
            np.testing.assert_array_equal(new_state[k], fake[k])

    def test_name_mismatch_falls_back_to_order(self, tmp_path):
        """An .h5 whose name counters are offset (Keras counters are global
        per process, so a model built second gets conv2d_7...) still imports
        via ordered (suffix, shape) matching — the same resolution Keras'
        own load_weights uses."""
        params, state = init_small()
        rng = np.random.RandomState(1)
        fake = {
            k: rng.randn(*np.shape(v)).astype(np.float32)
            for k, v in {**params, **state}.items()
        }
        # same construction order, all layer names offset
        layers = [
            ("conv2d_7", [
                ("conv2d_7/kernel:0", fake["conv2d/kernel"]),
                ("conv2d_7/bias:0", fake["conv2d/bias"]),
            ]),
            ("batch_normalization_3", [
                ("batch_normalization_3/gamma:0", fake["batch_normalization/gamma"]),
                ("batch_normalization_3/beta:0", fake["batch_normalization/beta"]),
                ("batch_normalization_3/moving_mean:0", fake["batch_normalization/moving_mean"]),
                ("batch_normalization_3/moving_variance:0", fake["batch_normalization/moving_variance"]),
            ]),
            ("conv2d_transpose_2", [
                ("conv2d_transpose_2/kernel:0", fake["conv2d_transpose/kernel"]),
                ("conv2d_transpose_2/bias:0", fake["conv2d_transpose/bias"]),
            ]),
            ("separable_conv2d_4", [
                ("separable_conv2d_4/depthwise_kernel:0", keras_dw(fake["separable_conv2d/depthwise_kernel"])),
                ("separable_conv2d_4/pointwise_kernel:0", fake["separable_conv2d/pointwise_kernel"]),
                ("separable_conv2d_4/bias:0", fake["separable_conv2d/bias"]),
            ]),
        ]
        path = str(tmp_path / "w.h5")
        write_keras_h5(path, layers)
        new_params, new_state, report = ckpt.import_h5_weights(path, params, state)
        assert report.complete and report.matched_by_order > 0
        # the abandoned name pass leaves a diagnostic (not a failure): a
        # matched_by_order import should be explainable from the report
        assert report.name_pass_rejected
        assert "name pass rejected" in report.summary()
        for k in params:
            np.testing.assert_array_equal(new_params[k], fake[k])
        for k in state:
            np.testing.assert_array_equal(new_state[k], fake[k])

    def test_colliding_offset_names_resolve_by_order(self, tmp_path):
        """Regression (round-3 e2e run): an .h5 written with OFFSET Keras
        counters can contain names that collide with a fresh model's names
        while denoting different layers.  Partial name matching must be
        rejected wholesale — everything resolves by construction order."""
        params, state = init_small()
        rng = np.random.RandomState(4)
        fake = {
            k: rng.randn(*np.shape(v)).astype(np.float32)
            for k, v in {**params, **state}.items()
        }
        # construction order preserved, but names shifted by one conv2d
        # counter: the h5's "conv2d_1" is OUR "conv2d" etc., and the h5's
        # "conv2d" slot does not exist -> a naive name pass would leave
        # some targets unmatched and, worse, could collide on same-shape
        # layers.  Note "conv2d_1" here carries the FIRST conv's weights.
        layers = [
            ("conv2d_1", [
                ("conv2d_1/kernel:0", fake["conv2d/kernel"]),
                ("conv2d_1/bias:0", fake["conv2d/bias"]),
            ]),
            ("batch_normalization_1", [
                ("batch_normalization_1/gamma:0", fake["batch_normalization/gamma"]),
                ("batch_normalization_1/beta:0", fake["batch_normalization/beta"]),
                ("batch_normalization_1/moving_mean:0", fake["batch_normalization/moving_mean"]),
                ("batch_normalization_1/moving_variance:0", fake["batch_normalization/moving_variance"]),
            ]),
            ("conv2d_transpose_1", [
                ("conv2d_transpose_1/kernel:0", fake["conv2d_transpose/kernel"]),
                ("conv2d_transpose_1/bias:0", fake["conv2d_transpose/bias"]),
            ]),
            ("separable_conv2d_1", [
                ("separable_conv2d_1/depthwise_kernel:0", keras_dw(fake["separable_conv2d/depthwise_kernel"])),
                ("separable_conv2d_1/pointwise_kernel:0", fake["separable_conv2d/pointwise_kernel"]),
                ("separable_conv2d_1/bias:0", fake["separable_conv2d/bias"]),
            ]),
        ]
        path = str(tmp_path / "w.h5")
        write_keras_h5(path, layers)
        new_params, new_state, report = ckpt.import_h5_weights(path, params, state)
        assert report.complete
        assert report.matched_by_name == 0  # partial names rejected
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
        new_params, new_state, report = ckpt.import_h5_weights(
            path, params, state, strict=False
        )
        after, _ = M.apply(small_model, new_params, new_state, x)
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_strict_raises_on_partial_h5(self, tmp_path):
        """A half-matching import must fail loudly, not half-load."""
        params, state = init_small()
        fake_layers = [("conv2d", [("conv2d/kernel:0",
                                    np.full((3, 3, 3, 4), 0.5, np.float32))])]
        path = str(tmp_path / "w.h5")
        write_keras_h5(path, fake_layers)
        with pytest.raises(ValueError, match="UNMATCHED TARGET"):
            ckpt.import_h5_weights(path, params, state, strict=True)

    def test_strict_raises_on_leftover_h5(self, tmp_path):
        params, state = init_small()
        ckpt.export_h5_weights(str(tmp_path / "w.h5"), params, state)
        import h5py

        with h5py.File(str(tmp_path / "w.h5"), "a") as f:
            g = f.create_group("conv2d_99")
            g.create_dataset("conv2d_99/kernel:0", data=np.zeros((9, 9, 9, 9), np.float32))
            g.attrs["weight_names"] = [b"conv2d_99/kernel:0"]
            old = [
                n.encode() if isinstance(n, str) else n
                for n in f.attrs["layer_names"]
            ]
            f.attrs["layer_names"] = old + [b"conv2d_99"]
        with pytest.raises(ValueError, match="LEFTOVER H5"):
            ckpt.import_h5_weights(str(tmp_path / "w.h5"), params, state, strict=True)

    def test_nonstrict_reports_unmatched(self, tmp_path):
        params, state = init_small()
        fake_layers = [("conv2d", [("conv2d/kernel:0",
                                    np.full((3, 3, 3, 4), 0.5, np.float32))])]
        path = str(tmp_path / "w.h5")
        write_keras_h5(path, fake_layers)
        _, _, report = ckpt.import_h5_weights(path, params, state, strict=False)
        assert not report.complete
        assert "conv2d/bias" in report.unmatched_ours
        # partial name coverage is NOT trusted (offset-counter h5s contain
        # colliding names); the kernel resolves via the ordered pass instead
        assert report.matched_by_name == 0 and report.matched_by_order == 1


class TestH5RoundTripZoo:
    """VERDICT round-1 item 3: executable evidence for the .h5 path on every
    zoo model — export known pytrees in the Keras layout, import into a
    fresh random init, demand bit-equality and identical forwards."""

    @staticmethod
    def _perturbed(params, state):
        """A distinct target pytree without paying a second model init."""
        return (
            {k: np.asarray(v) + 0.5 for k, v in params.items()},
            {k: np.asarray(v) + 0.25 for k, v in state.items()},
        )

    @pytest.mark.parametrize("name", ["res34", "hrnet", "v3plus", "scse", "bam"])
    def test_roundtrip_and_forward_equality(self, tmp_path, name):
        import jax

        from building_detection_tpu.models.registry import MODEL_REGISTRY, init_model

        src_params, src_state = init_model(name, jax.random.key(7), (1, 32, 32, 3))
        path = str(tmp_path / f"{name}.h5")
        ckpt.export_h5_weights(
            path,
            {k: np.asarray(v) for k, v in src_params.items()},
            {k: np.asarray(v) for k, v in src_state.items()},
        )
        tgt_params, tgt_state = self._perturbed(src_params, src_state)
        got_params, got_state, report = ckpt.import_h5_weights(
            path, tgt_params, tgt_state, strict=True
        )
        assert report.complete
        assert report.matched_by_name == len(src_params) + len(src_state)
        for k in src_params:
            np.testing.assert_array_equal(got_params[k], np.asarray(src_params[k]))
        for k in src_state:
            np.testing.assert_array_equal(got_state[k], np.asarray(src_state[k]))
        # forward equality with the source twin
        fn = MODEL_REGISTRY[name]
        x = jax.random.uniform(jax.random.key(9), (1, 32, 32, 3), minval=-1, maxval=1)
        f = jax.jit(lambda p, s, xx: M.apply(fn, p, s, xx)[0])
        y_src = np.asarray(f(src_params, src_state, x))
        y_got = np.asarray(f(
            {k: jnp.asarray(v) for k, v in got_params.items()},
            {k: jnp.asarray(v) for k, v in got_state.items()},
            x,
        ))
        np.testing.assert_array_equal(y_src, y_got)

    def test_shape_ambiguous_stack_resolves_by_order(self, tmp_path):
        """The 16 shape-identical Xception middle-flow blocks
        (`v3plus.py:239-252`) must land on the right targets even when NO
        names match (order-based fallback)."""
        import jax

        from building_detection_tpu.models.registry import init_model

        src_params, src_state = init_model("v3plus", jax.random.key(3), (1, 32, 32, 3))
        src_params = {k: np.asarray(v) for k, v in src_params.items()}
        src_state = {k: np.asarray(v) for k, v in src_state.items()}
        src_h5 = str(tmp_path / "v3plus_src.h5")
        ckpt.export_h5_weights(src_h5, src_params, src_state)
        # rewrite with every layer renamed (simulating Keras' global name
        # counters being offset) but construction order preserved
        renamed = {}
        for layer, suffix, _full, arr in ckpt._read_h5_entries(src_h5):
            if suffix == "depthwise_kernel":
                # _read_h5_entries normalized to our layout; the rewritten
                # file must carry the Keras layout again
                arr = keras_dw(arr)
            renamed.setdefault(f"x_{layer}", []).append(
                (f"x_{layer}/{suffix}:0", arr)
            )
        path = str(tmp_path / "v3plus_renamed.h5")
        write_keras_h5(path, list(renamed.items()))
        tgt_params, tgt_state = TestH5RoundTripZoo._perturbed(src_params, src_state)
        got_params, got_state, report = ckpt.import_h5_weights(
            path, tgt_params, tgt_state, strict=True
        )
        assert report.complete and report.matched_by_name == 0
        for k in src_params:
            np.testing.assert_array_equal(got_params[k], src_params[k])
        for k in src_state:
            np.testing.assert_array_equal(got_state[k], src_state[k])


class TestKerasLayerOrder:
    """The canonical-order export contract: tf_keras' POSITIONAL
    ``model.load_weights`` pairs file groups with ``model.layers`` (graph
    depth order), so ``export_h5_weights(layer_order=...)`` must write that
    order and the checked-in orders must exactly cover each zoo model's
    layers.  The real-TF acceptance (reverse direction, bit-identical
    forward after Keras loads our file) runs in tests/test_tf_oracle.py."""

    @pytest.mark.parametrize("name", ["res34", "hrnet", "v3plus", "scse", "bam"])
    def test_order_covers_zoo_layers(self, name):
        from building_detection_tpu.models.registry import (
            init_model, keras_layer_order)

        order = keras_layer_order(name)
        assert len(order) == len(set(order))
        params, state = init_model(name, jax.random.key(0), (1, 32, 32, 3))
        ours = {k.rsplit("/", 1)[0] for k in list(params) + list(state)}
        assert ours == set(order)

    def test_export_writes_given_order_and_version(self, tmp_path):
        from building_detection_tpu.models.registry import (
            init_model, keras_layer_order)

        params, state = init_model("scse", jax.random.key(0), (1, 32, 32, 3))
        order = keras_layer_order("scse")
        path = str(tmp_path / "ordered.h5")
        ckpt.export_h5_weights(
            path,
            {k: np.asarray(v) for k, v in params.items()},
            {k: np.asarray(v) for k, v in state.items()},
            layer_order=order,
        )
        with h5py.File(path) as f:
            got = [n.decode() if isinstance(n, bytes) else n
                   for n in f.attrs["layer_names"]]
            # without keras_version, tf_keras routes loads through the
            # Keras-1 legacy path that transposes ConvTranspose kernels
            assert f.attrs["keras_version"] in ("2.21.0", b"2.21.0")
        assert got == order
        # the default (instantiation) order differs -> the option matters
        path2 = str(tmp_path / "default.h5")
        ckpt.export_h5_weights(
            path2,
            {k: np.asarray(v) for k, v in params.items()},
            {k: np.asarray(v) for k, v in state.items()},
        )
        with h5py.File(path2) as f:
            default = [n.decode() if isinstance(n, bytes) else n
                       for n in f.attrs["layer_names"]]
        assert set(default) == set(order)

    def test_export_weight_order_is_keras_not_dict_order(self, tmp_path):
        """Keras pairs weights INSIDE each group positionally too: kernel
        before bias, BN gamma/beta/moving_mean/moving_variance, separable
        depthwise/pointwise/bias.  A checkpoint that round-tripped through
        npz (np.savez sorts keys -> bias sorts before kernel) must still
        export in Keras order — caught live by scripts/train_deploy_demo.py
        when tf_keras loaded a trained npz's bias into the kernel slot."""
        from building_detection_tpu.models.registry import init_model

        params, state = init_model("v3plus", jax.random.key(0), (1, 32, 32, 3))
        params = {k: np.asarray(v) for k, v in params.items()}
        state = {k: np.asarray(v) for k, v in state.items()}
        path = str(tmp_path / "sorted.h5")
        # alphabetical key order, as np.load(npz) iteration yields
        ckpt.export_h5_weights(
            path,
            dict(sorted(params.items())),
            dict(sorted(state.items())),
        )
        rank = {"kernel": 0, "depthwise_kernel": 0, "pointwise_kernel": 1,
                "gamma": 0, "beta": 1, "bias": 2,
                "moving_mean": 3, "moving_variance": 4}
        with h5py.File(path) as f:
            names = [n.decode() if isinstance(n, bytes) else n
                     for n in f.attrs["layer_names"]]
            saw_bn = saw_sep = False
            for ln in names:
                wns = [w.decode() if isinstance(w, bytes) else w
                       for w in f[ln].attrs["weight_names"]]
                suffixes = [w.rsplit("/", 1)[1][:-2] for w in wns]
                assert suffixes == sorted(suffixes, key=rank.__getitem__), (
                    ln, suffixes)
                if "moving_variance" in suffixes:
                    saw_bn = True
                    assert suffixes == ["gamma", "beta",
                                        "moving_mean", "moving_variance"]
                if "pointwise_kernel" in suffixes:
                    saw_sep = True
                    assert suffixes[:2] == ["depthwise_kernel",
                                            "pointwise_kernel"]
            assert saw_bn and saw_sep  # the orderings above were exercised

    def test_export_rejects_mismatched_order(self, tmp_path):
        params, state = init_small()
        with pytest.raises(ValueError, match="layer_order"):
            ckpt.export_h5_weights(
                str(tmp_path / "bad.h5"),
                {k: np.asarray(v) for k, v in params.items()},
                {k: np.asarray(v) for k, v in state.items()},
                layer_order=["not_a_layer"],
            )
