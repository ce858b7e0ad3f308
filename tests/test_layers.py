"""Layer-level parity tests vs TF/Keras semantics, computed by hand in numpy.

The reference relies on Keras defaults (SAME padding, BN momentum/epsilon,
valid pooling, nearest upsampling); these tests pin our layers to those exact
semantics per SURVEY.md section 7 "Hard parts".
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.nn import layers as L


def run_layer(fn, *args, train=False, **kwargs):
    """Init+apply a single-layer model, returning (out, params, state)."""

    def model(s, *a):
        return fn(s, *a, **kwargs)

    params, state = M.init(model, jax.random.key(0), *args)
    out, new_state = M.apply(model, params, state, *args, train=train)
    return out, params, new_state


def tf_same_pads(in_size, k, stride, dilation=1):
    """TF SAME padding: total pad so out = ceil(in/stride), extra on the right."""
    k_eff = k + (k - 1) * (dilation - 1)
    out = -(-in_size // stride)
    pad = max((out - 1) * stride + k_eff - in_size, 0)
    return pad // 2, pad - pad // 2


def np_conv2d_same(x, w, stride=1, dilation=1):
    """Direct NHWC convolution with TF SAME padding (slow reference)."""
    n, h, wid, cin = x.shape
    kh, kw, _, cout = w.shape
    if dilation > 1:
        wd = np.zeros(((kh - 1) * dilation + 1, (kw - 1) * dilation + 1, cin, cout), w.dtype)
        wd[::dilation, ::dilation] = w
        w, (kh, kw) = wd, wd.shape[:2]
    pt, pb = tf_same_pads(h, kh, stride)
    pl, pr = tf_same_pads(wid, kw, stride)
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    oh = -(-h // stride)
    ow = -(-wid // stride)
    out = np.zeros((n, oh, ow, cout), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hwco->no", patch, w)
    return out


class TestConv2D:
    @pytest.mark.parametrize("stride,k,dil", [(1, 3, 1), (2, 3, 1), (2, 1, 1), (1, 3, 6), (1, 3, 4)])
    def test_same_padding_matches_tf(self, stride, k, dil):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 17, 13, 3).astype(np.float32)
        out, params, _ = run_layer(
            L.conv2d, jnp.asarray(x), 5, k, strides=stride, dilation=dil, use_bias=False
        )
        w = np.asarray(params["conv2d/kernel"])
        expected = np_conv2d_same(x, w, stride, dil)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)

    def test_bias_and_relu(self):
        x = jnp.ones((1, 4, 4, 2))
        out, params, _ = run_layer(L.conv2d, x, 3, 1, activation="relu")
        assert out.shape == (1, 4, 4, 3)
        assert (np.asarray(out) >= 0).all()


class TestSeparableConv2D:
    def test_matches_depthwise_then_pointwise(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 9, 9, 4).astype(np.float32)
        out, params, _ = run_layer(
            L.separable_conv2d, jnp.asarray(x), 6, 3, strides=2, use_bias=False
        )
        dw = np.asarray(params["separable_conv2d/depthwise_kernel"])  # (3,3,1,4)
        pw = np.asarray(params["separable_conv2d/pointwise_kernel"])  # (1,1,4,6)
        # depthwise = per-channel conv
        mid = np.zeros((1, 5, 5, 4), np.float32)
        for c in range(4):
            mid[..., c : c + 1] = np_conv2d_same(
                x[..., c : c + 1], dw[:, :, :, c : c + 1], stride=2
            )
        expected = mid @ pw[0, 0]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


class TestConv2DTranspose:
    @pytest.mark.parametrize("k,stride", [(2, 2), (3, 2)])
    def test_matches_gradient_of_forward_conv(self, k, stride):
        """Keras Conv2DTranspose == vjp of the SAME forward conv (TF's definition)."""
        rng = np.random.RandomState(2)
        cin, cout, t = 3, 5, 8
        x = rng.randn(2, t, t, cin).astype(np.float32)
        out, params, _ = run_layer(
            L.conv2d_transpose, jnp.asarray(x), cout, k, strides=stride, use_bias=False
        )
        assert out.shape == (2, t * stride, t * stride, cout)
        w = params["conv2d_transpose/kernel"]  # (k, k, cout, cin)

        def forward(z):  # z: (2, t*stride, t*stride, cout)
            return jax.lax.conv_general_dilated(
                z,
                w,
                window_strides=(stride, stride),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        z0 = jnp.zeros((2, t * stride, t * stride, cout))
        _, vjp = jax.vjp(forward, z0)
        (expected,) = vjp(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-4, atol=2e-5)


class TestBatchNorm:
    def test_inference_uses_moving_stats(self):
        x = jnp.asarray(np.random.RandomState(3).randn(4, 5, 5, 3).astype(np.float32))

        def model(s, x):
            return L.batch_norm(s, x)

        params, state = M.init(model, jax.random.key(0), x)
        # moving_mean=0, moving_var=1 at init -> inference output = x * 1 + 0
        out, _ = M.apply(model, params, state, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x) / np.sqrt(1 + 1e-3), rtol=1e-5
        )

    def test_train_normalizes_and_updates_moving(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(8, 6, 6, 2).astype(np.float32) * 3 + 1)

        def model(s, x):
            return L.batch_norm(s, x)

        params, state = M.init(model, jax.random.key(0), x)
        out, new_state = M.apply(model, params, state, x, train=True)
        o = np.asarray(out)
        assert abs(o.mean()) < 1e-3 and abs(o.std() - 1) < 1e-2
        batch_mean = np.asarray(x).mean(axis=(0, 1, 2))
        np.testing.assert_allclose(
            np.asarray(new_state["batch_normalization/moving_mean"]),
            0.99 * 0 + 0.01 * batch_mean,
            rtol=1e-4,
        )
        # Keras updates moving variance with the UNBIASED batch variance
        # (Bessel over the 8*6*6 reduced samples) while normalizing with
        # the biased one — pinned against real tf_keras 2.21 by
        # scripts/tf_train_parity_probe.py (bit-exact there).
        n = 8 * 6 * 6
        batch_var = np.asarray(x).var(axis=(0, 1, 2)) * n / (n - 1)
        np.testing.assert_allclose(
            np.asarray(new_state["batch_normalization/moving_variance"]),
            0.99 * 1 + 0.01 * batch_var,
            rtol=1e-4,
        )

    def test_train_moving_variance_2d_is_biased(self):
        """tf_keras' NON-fused BN path (2-D inputs — the zoo's SE/BAM
        channel gates on (B, C) Dense outputs) feeds the BIASED batch
        variance to the moving EMA, unlike the fused 4-D path (Bessel).
        Verified empirically against tf_keras 2.21 (round-5 finding,
        scripts/tf_model_grad_parity.py): at n=batch=4 the distinction is a
        33% effect that the per-model step-1 state parity exposed."""
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(4, 8).astype(np.float32) * 2 + 1)

        def model(s, x):
            return L.batch_norm(s, x)

        params, state = M.init(model, jax.random.key(0), x)
        _, new_state = M.apply(model, params, state, x, train=True)
        biased_var = np.asarray(x).var(axis=0)  # NO Bessel
        np.testing.assert_allclose(
            np.asarray(new_state["batch_normalization/moving_variance"]),
            0.99 * 1 + 0.01 * biased_var,
            rtol=1e-4,
        )


class TestPooling:
    def test_max_pool_default(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        out = L.max_pool(x)
        np.testing.assert_array_equal(
            np.asarray(out)[0, :, :, 0], [[5, 7], [13, 15]]
        )

    def test_max_pool_stride4_pool2(self):
        # MaxPool2D(strides=4) in low_to_high_feature (res34.py:153)
        x = jnp.asarray(np.random.RandomState(5).rand(1, 16, 16, 2).astype(np.float32))
        out = L.max_pool(x, pool_size=2, strides=4)
        assert out.shape == (1, 4, 4, 2)
        xn = np.asarray(x)
        expected = np.stack(
            [
                [
                    xn[0, i * 4 : i * 4 + 2, j * 4 : j * 4 + 2, :].max(axis=(0, 1))
                    for j in range(4)
                ]
                for i in range(4)
            ]
        )
        np.testing.assert_allclose(np.asarray(out)[0], expected)

    def test_max_pool_same_3x3_s2(self):
        # MaxPooling2D((3,3), strides=2, padding='same') (v3plus.py:192)
        x = jnp.asarray(np.random.RandomState(6).rand(1, 8, 8, 1).astype(np.float32))
        out = L.max_pool(x, pool_size=3, strides=2, padding="SAME")
        assert out.shape == (1, 4, 4, 1)

    def test_avg_pool_global_equivalence(self):
        x = jnp.asarray(np.random.RandomState(7).rand(2, 32, 32, 4).astype(np.float32))
        via_pool = L.avg_pool(x, 32)
        via_gap = L.global_avg_pool(x, keepdims=True)
        np.testing.assert_allclose(np.asarray(via_pool), np.asarray(via_gap), rtol=1e-5)


class TestUpsample:
    def test_nearest(self):
        x = jnp.asarray([[[[1.0], [2.0]], [[3.0], [4.0]]]])
        out = L.upsample2d(x, 2)
        np.testing.assert_array_equal(
            np.asarray(out)[0, :, :, 0],
            [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
        )


class TestModuleSystem:
    def test_auto_naming_matches_keras_convention(self):
        def model(s, x):
            x = L.conv2d(s, x, 2, 1)
            x = L.conv2d(s, x, 2, 1)
            x = L.batch_norm(s, x)
            return x

        params, state = M.init(model, jax.random.key(0), jnp.ones((1, 2, 2, 2)))
        assert "conv2d/kernel" in params
        assert "conv2d_1/kernel" in params
        assert "batch_normalization/gamma" in params
        assert "batch_normalization/moving_mean" in state

    def test_duplicate_name_raises(self):
        def model(s, x):
            L.conv2d(s, x, 2, 1, name="a")
            L.conv2d(s, x, 2, 1, name="a")

        with pytest.raises(ValueError, match="duplicate"):
            M.init(model, jax.random.key(0), jnp.ones((1, 2, 2, 2)))

    def test_apply_is_jittable_and_pure(self):
        def model(s, x):
            return L.conv2d(s, x, 3, 3, activation="relu")

        x = jnp.ones((1, 8, 8, 2))
        params, state = M.init(model, jax.random.key(0), x)
        f = jax.jit(lambda p, st, xx: M.apply(model, p, st, xx)[0])
        np.testing.assert_allclose(
            np.asarray(f(params, state, x)),
            np.asarray(M.apply(model, params, state, x)[0]),
            rtol=1e-6,
        )


class TestInt8Pointwise:
    """Opt-in int8 MXU pointwise path (docs/ARCHITECTURE.md round 3)."""

    @staticmethod
    def _model(s, x):
        x = L.separable_conv2d(s, x, 16, 3, activation="relu")
        x = L.conv2d(s, x, 8, 1)
        return L.conv2d(s, x, 2, 3, activation="softmax")

    def test_close_to_f32_and_train_unaffected(self):
        params, state = M.init(self._model, jax.random.key(0), jnp.zeros((2, 16, 16, 3)))
        x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3), minval=-1, maxval=1)
        ref, _ = M.apply(self._model, params, state, x)
        q, _ = M.apply(self._model, params, state, x, int8_pointwise=True)
        ref, q = np.asarray(ref), np.asarray(q)
        assert np.isfinite(q).all()
        # quantization noise is bounded but nonzero (the flag is opt-in
        # precisely because it voids pixel parity)
        assert np.abs(q - ref).max() < 0.1
        assert (q.argmax(-1) == ref.argmax(-1)).mean() > 0.95
        # training ignores the flag entirely (bit-identical path)
        t1, _ = M.apply(self._model, params, state, x, train=True, int8_pointwise=True)
        t2, _ = M.apply(self._model, params, state, x, train=True)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_strided_and_spatial_convs_not_quantized(self):
        """Only 1x1 stride-1 dilation-1 projections take the int8 path;
        everything else is bit-identical with the flag on."""
        def model(s, x):
            x = L.conv2d(s, x, 8, 3, strides=2)     # spatial + strided
            x = L.conv2d(s, x, 8, 1, strides=2)     # 1x1 but strided
            return L.conv2d(s, x, 8, 3, dilation=2)  # dilated

        params, state = M.init(model, jax.random.key(2), jnp.zeros((1, 16, 16, 3)))
        x = jax.random.uniform(jax.random.key(3), (1, 16, 16, 3), minval=-1, maxval=1)
        a, _ = M.apply(model, params, state, x)
        b, _ = M.apply(model, params, state, x, int8_pointwise=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
