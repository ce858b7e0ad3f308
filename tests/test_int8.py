"""Opt-in int8 pointwise quantization: gating, calibration, scale baking.

The reference has no quantized path; `int8_pointwise` is a framework-only
opt-in (docs/ARCHITECTURE.md round 3) that trades pixel parity for MXU
throughput on 1x1 projections.  These tests pin its semantics:

* gating: only inference-mode 1x1/stride-1/dilation-1 sites quantize, and
  an integer flag value acts as a minimum input-channel threshold;
* calibration (`core.module.calibrate_int8`) records per-site activation
  amax such that a calibrated run on the calibration data itself matches
  the dynamic-scale run;
* the pipeline-level helper cuts calibration tiles with the inference
  tiler geometry and returns one scale dict per ensemble member.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import Config, TilerConfig
from building_detection_tpu.nn import layers as L


def toy(s, x):
    x = L.conv2d(s, x, 16, 1, use_bias=False)
    x = jax.nn.relu(x)
    x = L.separable_conv2d(s, x, 8, 3, use_bias=False)
    x = L.conv2d(s, x, 4, 3, use_bias=False)  # spatial: never quantized
    return x


@pytest.fixture(scope="module")
def toy_vars():
    params, state = M.init(toy, jax.random.key(0), jnp.zeros((2, 16, 16, 3)))
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    )
    return params, state, x


class TestGating:
    def test_off_by_default(self, toy_vars):
        params, state, x = toy_vars
        amax = {}
        M.apply(toy, params, state, x, int8_amax=amax)
        assert amax == {}

    def test_active_sites_are_pointwise_only(self, toy_vars):
        params, state, x = toy_vars
        amax = {}
        M.apply(toy, params, state, x, int8_pointwise=True, int8_amax=amax)
        # the 3-ch 1x1, the separable pointwise; NOT the spatial 3x3
        assert set(amax) == {"conv2d", "separable_conv2d"}

    def test_int_flag_is_min_input_channels(self, toy_vars):
        params, state, x = toy_vars
        amax = {}
        # conv2d sees 3 input channels, separable_conv2d sees 16
        M.apply(toy, params, state, x, int8_pointwise=4, int8_amax=amax)
        assert set(amax) == {"separable_conv2d"}

    def test_training_never_quantizes(self, toy_vars):
        params, state, x = toy_vars
        amax = {}
        M.apply(
            toy, params, state, x, train=True,
            rng=jax.random.key(1), int8_pointwise=True, int8_amax=amax,
        )
        assert amax == {}

    def test_quantized_output_close_to_f32(self, toy_vars):
        params, state, x = toy_vars
        y_q, _ = M.apply(toy, params, state, x, int8_pointwise=True)
        y_f, _ = M.apply(toy, params, state, x)
        rel = float(jnp.max(jnp.abs(y_q - y_f)) / jnp.max(jnp.abs(y_f)))
        assert rel < 0.05  # int8 grid noise, not garbage


class TestCalibration:
    def test_calibrated_matches_dynamic_on_calibration_data(self, toy_vars):
        params, state, x = toy_vars
        scales = M.calibrate_int8(toy, params, state, [x])
        y_dyn, _ = M.apply(toy, params, state, x, int8_pointwise=True)
        y_cal, _ = M.apply(
            toy, params, state, x, int8_pointwise=True, int8_scales=scales
        )
        # same amax -> same quantization grid; only f32 round-trip noise
        np.testing.assert_allclose(
            np.asarray(y_dyn), np.asarray(y_cal), rtol=0, atol=1e-5
        )

    def test_max_over_batches(self, toy_vars):
        params, state, x = toy_vars
        s1 = M.calibrate_int8(toy, params, state, [x])
        s2 = M.calibrate_int8(toy, params, state, [x * 0.5, x])
        for site in s1:
            assert s2[site] == pytest.approx(s1[site], rel=1e-6)

    def test_flag_threads_to_sites(self, toy_vars):
        params, state, x = toy_vars
        scales = M.calibrate_int8(toy, params, state, [x], int8_pointwise=4)
        assert set(scales) == {"separable_conv2d"}

    def test_calibrated_larger_input_still_static(self, toy_vars):
        # a run on data NOT seen in calibration stays finite/close: the
        # static scale clips instead of rescaling
        params, state, x = toy_vars
        scales = M.calibrate_int8(toy, params, state, [x])
        y_f, _ = M.apply(toy, params, state, x * 2.0)
        y_c, _ = M.apply(
            toy, params, state, x * 2.0,
            int8_pointwise=True, int8_scales=scales,
        )
        assert np.isfinite(np.asarray(y_c)).all()
        # clipping distorts but the first conv's scale saw |2x| via relu,
        # so outputs stay in the same ballpark
        rel = float(
            jnp.max(jnp.abs(y_c - y_f)) / jnp.max(jnp.abs(y_f))
        )
        assert rel < 0.5


class TestPipelineHelper:
    def test_calibration_tiles_geometry(self):
        from building_detection_tpu.infer.pipeline import _calibration_tiles

        cfg = Config()
        cfg = type(cfg)(tiler=TilerConfig(tile=32, stride=24, overlap=8))
        scenes = [np.zeros((70, 50, 3), np.uint8)]
        tiles = _calibration_tiles(scenes, cfg, max_tiles=100)
        assert tiles.shape[1:] == (32, 32, 3)
        assert tiles.dtype == np.uint8
        # plan for 70x50 under tile=32/stride=24 gives n_h*n_w tiles
        from building_detection_tpu.ops import tiling as T

        plan = T.plan_tiles(70, 50, cfg.tiler)
        assert tiles.shape[0] == plan.num_tiles

    def test_calibrate_members_returns_per_member_scales(self):
        from building_detection_tpu.infer.pipeline import (
            calibrate_members_int8,
        )

        cfg = Config()
        cfg = type(cfg)(tiler=TilerConfig(tile=32, stride=24, overlap=8))

        def member(s, x):
            x = L.conv2d(s, x, 8, 1, use_bias=False)
            return jax.nn.softmax(L.conv2d(s, x, 2, 1, use_bias=False))

        members = {}
        for i, name in enumerate(("a", "b")):
            p, st = M.init(member, jax.random.key(i), jnp.zeros((1, 32, 32, 3)))
            members[name] = (member, p, st)
        scenes = [
            (np.random.RandomState(7).rand(70, 50, 3) * 255).astype(np.uint8)
        ]
        scales = calibrate_members_int8(
            members, scenes, cfg=cfg, compute_dtype=jnp.float32
        )
        assert set(scales) == {"a", "b"}
        for d in scales.values():
            assert set(d) == {"conv2d", "conv2d_1"}
            assert all(v > 0 for v in d.values())

    def test_scales_json_round_trip(self, tmp_path):
        from building_detection_tpu.infer.pipeline import (
            load_int8_scales,
            save_int8_scales,
        )

        scales = {"res34": {"conv2d": 1.5, "conv2d_7": 0.25}}
        path = str(tmp_path / "scales.json")
        save_int8_scales(path, scales)
        assert load_int8_scales(path) == scales
