"""Multi-device execution on the 8-device virtual CPU mesh: sharded tile
inference matches single-device output; DP training matches single-device
gradients; callbacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core import module as M
from building_detection_tpu.core.config import TilerConfig, TrainConfig
from building_detection_tpu.infer.engine import TiledPredictor
from building_detection_tpu.nn import layers as L
from building_detection_tpu.parallel import mesh as pmesh
from building_detection_tpu.train.callbacks import EarlyStopping, EpochVisualizer
from building_detection_tpu.train.trainer import Trainer

CFG = TilerConfig(tile=32, stride=24, overlap=8)


def tiny_model(s, x):
    x = L.conv2d(s, x, 8, 3, strides=2, activation="relu")
    x = L.conv2d_transpose(s, x, 8, 2, strides=2, activation="relu")
    return L.conv2d(s, x, 2, 3, activation="softmax")


class TestMakeMesh:
    def test_batch_size_caps_data_axis(self):
        """data=-1 with a batch hint shards gcd(batch, devices) ways — the
        one rule shared by bdt-train/bdt-eval (a batch of 2 on an 8-device
        host must shard 2 ways, not 8)."""
        assert jax.device_count() >= 8
        assert pmesh.make_mesh(data=-1, batch_size=2).shape["data"] == 2
        assert pmesh.make_mesh(data=-1, batch_size=8).shape["data"] == 8
        assert pmesh.make_mesh(data=-1, batch_size=12).shape["data"] == 4
        # explicit data wins; the hint only resolves -1
        assert pmesh.make_mesh(data=4, batch_size=2).shape["data"] == 4


class TestShardedInference:
    def test_matches_single_device(self):
        assert jax.device_count() >= 8
        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        params, state = M.init(tiny_model, jax.random.key(0), x)
        img = np.random.RandomState(0).randint(0, 256, (80, 104, 3), np.uint8)

        single = TiledPredictor(
            tiny_model, params, state, CFG, batch_tiles=2,
            compute_dtype=jnp.float32,
        )
        mesh = pmesh.make_mesh(data=8)
        sharded = TiledPredictor(
            tiny_model, params, state, CFG, batch_tiles=1,
            compute_dtype=jnp.float32, mesh=mesh,
        )
        np.testing.assert_array_equal(
            single.predict_mask(img), sharded.predict_mask(img)
        )


class TestDPMatchesSingle:
    def test_gradient_equivalence(self):
        """DP over 8 devices == single-device training, step for step."""
        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=16)
        imgs = np.random.RandomState(1).randint(0, 256, (8, 16, 16, 3), np.uint8)
        labs = np.where(np.random.RandomState(2).rand(8, 16, 16) < 0.4, 255, 0).astype(np.uint8)

        t_multi = Trainer(tiny_model, cfg, steps_per_epoch=2,
                          mesh=pmesh.make_mesh(data=8))
        t_single = Trainer(tiny_model, cfg, steps_per_epoch=2,
                           mesh=pmesh.make_mesh(data=1, devices=jax.devices()[:1]))
        for _ in range(3):
            m_multi = t_multi.train_on_batch(imgs, labs)
            m_single = t_single.train_on_batch(imgs, labs)
        assert m_multi["loss"] == pytest.approx(m_single["loss"], rel=2e-4)
        assert m_multi["PA"] == pytest.approx(m_single["PA"], abs=1e-5)


class TestTPTraining:
    def test_hybrid_dp_tp_close_to_dp(self):
        """dp(2) x tp(4) training: conv out-channels GSPMD-sharded over the
        model axis, optimizer moments inheriting the shardings.  Agreement
        with pure DP is float-noise, not bitwise (different programs — see
        the one-compiled-program rule in docs/ARCHITECTURE.md); losses are
        insensitive reductions and compare tightly, params loosely (Adam
        amplifies reduction-order ulps at near-zero gradients)."""
        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=16)
        rng = np.random.RandomState(7)
        imgs = rng.randint(0, 256, (8, 16, 16, 3), np.uint8)
        labs = np.where(rng.rand(8, 16, 16) < 0.4, 255, 0).astype(np.uint8)

        t_tp = Trainer(tiny_model, cfg, steps_per_epoch=2,
                       mesh=pmesh.make_mesh(data=2, model=4), tp=True)
        assert t_tp.tp
        # the 8-out-channel kernels actually shard over the 4-way model axis
        from building_detection_tpu.parallel.mesh import MODEL_AXIS
        sharded_kernels = [
            k for k, v in t_tp.params.items()
            if MODEL_AXIS in str(getattr(v.sharding, "spec", ""))
        ]
        assert sharded_kernels, "no parameter was TP-sharded"

        t_dp = Trainer(tiny_model, cfg, steps_per_epoch=2,
                       mesh=pmesh.make_mesh(data=8))
        m_tp = t_tp.train_on_batch(imgs, labs)
        m_dp = t_dp.train_on_batch(imgs, labs)
        assert m_tp["loss"] == pytest.approx(m_dp["loss"], rel=2e-4)
        pa = jax.device_get(t_tp.params)
        pb = jax.device_get(t_dp.params)
        for k in pa:
            np.testing.assert_allclose(
                pa[k], pb[k], rtol=1e-3, atol=1e-4, err_msg=k
            )
        # staged epoch runs under TP too (same scan body)
        metrics = t_tp.train_epoch_staged(*t_tp.stage_dataset(imgs, labs))
        assert np.isfinite(metrics["loss"]).all()

    def test_tp_resume_keeps_shardings(self, tmp_path):
        """save -> restore on a TP trainer must re-place the variables with
        their TP shardings (a plain replicate would silently run the rest
        of training unsharded)."""
        from building_detection_tpu.parallel.mesh import MODEL_AXIS

        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=16)
        rng = np.random.RandomState(9)
        imgs = rng.randint(0, 256, (8, 16, 16, 3), np.uint8)
        labs = np.where(rng.rand(8, 16, 16) < 0.4, 255, 0).astype(np.uint8)
        tr = Trainer(tiny_model, cfg, steps_per_epoch=2,
                     mesh=pmesh.make_mesh(data=2, model=4), tp=True)
        tr.train_on_batch(imgs, labs)
        path = str(tmp_path / "ckpt.npz")
        tr.save(path)

        tr2 = Trainer(tiny_model, cfg, steps_per_epoch=2,
                      mesh=pmesh.make_mesh(data=2, model=4), tp=True)
        tr2.restore(path)
        assert tr2.step == 1
        sharded = [
            k for k, v in tr2.params.items()
            if MODEL_AXIS in str(getattr(v.sharding, "spec", ""))
        ]
        assert sharded, "restore dropped the TP shardings"
        # params round-trip exactly and training continues
        pa = jax.device_get(tr.params)
        pb = jax.device_get(tr2.params)
        for k in pa:
            np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)
        m = tr2.train_on_batch(imgs, labs)
        assert np.isfinite(m["loss"])

        # weights-only init (transfer learning) keeps TP shardings too
        tr3 = Trainer(tiny_model, cfg, steps_per_epoch=2,
                      mesh=pmesh.make_mesh(data=2, model=4), tp=True)
        tr3.load_weights(path)
        assert tr3.step == 0
        sharded3 = [
            k for k, v in tr3.params.items()
            if MODEL_AXIS in str(getattr(v.sharding, "spec", ""))
        ]
        assert sharded3, "load_weights dropped the TP shardings"
        pc = jax.device_get(tr3.params)
        for k in pa:
            np.testing.assert_array_equal(pa[k], pc[k], err_msg=k)


class TestCallbacks:
    def _data(self):
        imgs = np.random.RandomState(3).randint(0, 256, (8, 16, 16, 3), np.uint8)
        labs = np.where(np.random.RandomState(4).rand(8, 16, 16) < 0.4, 255, 0).astype(np.uint8)
        return imgs, labs

    def test_early_stopping_stops(self):
        cfg = TrainConfig(batch_size=8, epochs=10, warmup_epochs=1, image_size=16)
        tr = Trainer(tiny_model, cfg, steps_per_epoch=1)
        imgs, labs = self._data()

        def it():
            while True:
                yield imgs, labs

        stopper = EarlyStopping(monitor="val_PA", patience=2)
        # force "no improvement": monitor something constant by patching best
        stopper.best = 2.0  # impossible to beat
        hist = tr.fit(it(), val_iter=it(), val_steps=1, callbacks=[stopper],
                      log_fn=lambda s: None)
        assert len(hist) == 2  # stopped after patience epochs, not 10
        assert stopper.stopped_epoch == 2

    def test_visualizer_writes_png(self, tmp_path):
        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=16)
        tr = Trainer(tiny_model, cfg, steps_per_epoch=1)
        imgs, labs = self._data()

        def it():
            while True:
                yield imgs, labs

        viz = EpochVisualizer(imgs[0], labs[0], str(tmp_path))
        tr.fit(it(), callbacks=[viz], log_fn=lambda s: None)
        import os

        assert os.path.exists(tmp_path / "epoch_1_display.png")
        from building_detection_tpu.utils import io as uio

        png = uio.imread_rgb(str(tmp_path / "epoch_1_display.png"))
        assert png.shape == (16, 16 * 3 + 16, 3)


class TestEnsembleModelParallel:
    def test_per_device_members_match_single(self):
        """Members pinned to distinct devices produce identical masks."""
        from building_detection_tpu.infer.engine import EnsemblePredictor

        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        members = {}
        for i, name in enumerate(["a", "b", "c", "d", "e"]):
            params, state = M.init(tiny_model, jax.random.key(i), x)
            members[name] = (tiny_model, params, state)
        img = np.random.RandomState(7).randint(0, 256, (56, 80, 3), np.uint8)
        single = EnsemblePredictor(members, CFG, batch_tiles=2, compute_dtype=jnp.float32)
        multi = EnsemblePredictor(
            members, CFG, batch_tiles=2, compute_dtype=jnp.float32,
            devices=jax.devices()[:5],
        )
        ref = single.predict_masks(img)
        got = multi.predict_masks(img)
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k])


class TestFusedEnsembleOnMesh:
    def _members(self, n=5):
        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        members = {}
        for i, name in enumerate("abcde"[:n]):
            params, state = M.init(tiny_model, jax.random.key(i), x)
            members[name] = (tiny_model, params, state)
        return members

    def test_matches_single_device(self):
        """The production path (fused 5-member program) sharded over the
        data axis is bit-identical to single-device (VERDICT r1 item 4a)."""
        from building_detection_tpu.infer.fused_ensemble import (
            FusedEnsemblePredictor,
        )

        members = self._members()
        img = np.random.RandomState(21).randint(0, 256, (80, 104, 3), np.uint8)
        single = FusedEnsemblePredictor(
            members, CFG, batch_tiles=8, compute_dtype=jnp.float32
        )
        mesh = pmesh.make_mesh(data=8)
        sharded = FusedEnsemblePredictor(
            members, CFG, batch_tiles=1, compute_dtype=jnp.float32, mesh=mesh
        )
        ref = single.predict_masks(img)
        got = sharded.predict_masks(img)
        assert set(ref) == set(got)
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k])

    def test_pipelined_many_on_mesh(self):
        from building_detection_tpu.infer.fused_ensemble import (
            FusedEnsemblePredictor,
        )

        members = self._members(2)
        rng = np.random.RandomState(22)
        imgs = [rng.randint(0, 256, (56, 56, 3), np.uint8) for _ in range(3)]
        mesh = pmesh.make_mesh(data=8)
        sharded = FusedEnsemblePredictor(
            members, CFG, batch_tiles=1, compute_dtype=jnp.float32, mesh=mesh
        )
        single = FusedEnsemblePredictor(
            members, CFG, batch_tiles=2, compute_dtype=jnp.float32
        )
        many = sharded.predict_masks_many(imgs)
        for img, got in zip(imgs, many):
            ref = single.predict_masks(img)
            for k in ref:
                np.testing.assert_array_equal(got[k], ref[k])

    def test_rejects_model_axis(self):
        """fused + channel TP deliberately does not compose (documented)."""
        from building_detection_tpu.infer.fused_ensemble import (
            FusedEnsemblePredictor,
        )

        mesh = pmesh.make_mesh(data=2, model=4)
        with pytest.raises(ValueError, match="data-axis sharding only"):
            FusedEnsemblePredictor(
                self._members(2), CFG, compute_dtype=jnp.float32, mesh=mesh
            )


class TestEnsembleSharedUpload:
    def test_one_upload_per_device(self, monkeypatch):
        """predict_masks stages the scene once per distinct device, not once
        per member (VERDICT r1 item 4b: 5x upload waste)."""
        from building_detection_tpu.infer.engine import EnsemblePredictor

        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        members = {}
        for i, name in enumerate("abcde"):
            params, state = M.init(tiny_model, jax.random.key(i), x)
            members[name] = (tiny_model, params, state)
        img = np.random.RandomState(7).randint(0, 256, (56, 80, 3), np.uint8)

        puts = []
        real_put = jax.device_put

        def counting_put(val, dev=None, **kw):
            if getattr(val, "nbytes", 0) >= img.nbytes:
                puts.append(dev)
            return real_put(val, dev, **kw)

        # two members per device over 2 devices + default: uploads == devices
        ens = EnsemblePredictor(
            members, CFG, batch_tiles=2, compute_dtype=jnp.float32,
            devices=jax.devices()[:2],
        )
        monkeypatch.setattr(jax, "device_put", counting_put)
        masks = ens.predict_masks(img)
        assert len(masks) == 5
        assert len(puts) == 2  # NOT 5

    def test_degenerate_scene_blank_masks(self):
        from building_detection_tpu.infer.engine import EnsemblePredictor

        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        members = {}
        for i, name in enumerate("ab"):
            params, state = M.init(tiny_model, jax.random.key(i), x)
            members[name] = (tiny_model, params, state)
        ens = EnsemblePredictor(members, CFG, compute_dtype=jnp.float32)
        img = np.zeros((6, 6, 3), np.uint8)  # below overlap: no tiles
        masks = ens.predict_masks(img)
        for m in masks.values():
            assert m.shape == (6, 6) and not m.any()


class TestChannelTensorParallel:
    def test_tp_matches_single_device(self):
        """GSPMD channel TP over the model axis == single-device output."""
        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        params, state = M.init(tiny_model, jax.random.key(0), x)
        img = np.random.RandomState(11).randint(0, 256, (80, 104, 3), np.uint8)
        single = TiledPredictor(
            tiny_model, params, state, CFG, batch_tiles=2, compute_dtype=jnp.float32
        )
        mesh = pmesh.make_mesh(data=1, model=8)
        tp = TiledPredictor(
            tiny_model, params, state, CFG, batch_tiles=2,
            compute_dtype=jnp.float32, mesh=mesh, tp=True,
        )
        np.testing.assert_array_equal(single.predict_mask(img), tp.predict_mask(img))

    def test_dp_plus_tp(self):
        """2-way data x 4-way model mesh, both axes active."""
        x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
        params, state = M.init(tiny_model, jax.random.key(1), x)
        img = np.random.RandomState(12).randint(0, 256, (56, 56, 3), np.uint8)
        single = TiledPredictor(
            tiny_model, params, state, CFG, batch_tiles=2, compute_dtype=jnp.float32
        )
        mesh = pmesh.make_mesh(data=2, model=4)
        both = TiledPredictor(
            tiny_model, params, state, CFG, batch_tiles=1,
            compute_dtype=jnp.float32, mesh=mesh, tp=True,
        )
        np.testing.assert_array_equal(
            single.predict_mask(img), both.predict_mask(img)
        )
