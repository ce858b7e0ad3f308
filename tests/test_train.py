"""Training stack: losses/metrics/schedule vs the TF reference formulas,
plus a real (tiny) training loop with checkpoint/resume."""
import glob
import os

import cv2 as cv
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core.config import TrainConfig
from building_detection_tpu.nn import layers as L
from building_detection_tpu.train import losses as losses_mod
from building_detection_tpu.train import metrics as metrics_mod
from building_detection_tpu.train.schedule import exponential_decay, warmup_cosine
from building_detection_tpu.train.trainer import Trainer, make_targets

EPS = 1e-7


def random_batch(seed, n=2, hw=32):
    rng = np.random.RandomState(seed)
    y_pred = rng.dirichlet([1, 1], size=(n, hw, hw)).astype(np.float32)
    lab = (rng.rand(n, hw, hw) < 0.4).astype(np.float32)
    one_hot = np.stack([1 - lab, lab], -1).astype(np.float32)
    edge = rng.choice([1.0, 2.0], size=(n, hw, hw, 2)).astype(np.float32)
    y_true = np.concatenate([one_hot, edge], -1)
    return y_true, y_pred


class TestLosses:
    def test_binary_crossentropy(self):
        y_true, y_pred = random_batch(0)
        expected = -np.mean(
            np.sum(y_true[..., :2] * np.log(y_pred + EPS), axis=-1)
        )
        got = float(losses_mod.binary_crossentropy(jnp.asarray(y_true), jnp.asarray(y_pred)))
        assert got == pytest.approx(expected, rel=1e-6)

    def test_focal_loss(self):
        y_true, y_pred = random_batch(1)
        loss = [0.5, 0.5] * y_true[..., :2] * (1 - y_pred) ** 2 * np.log(y_pred + EPS)
        expected = -np.mean(loss.sum(-1))
        got = float(losses_mod.focal_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
        assert got == pytest.approx(expected, rel=1e-6)

    def test_edge_focal_loss(self):
        """Literal transcription of res34.py:344-356."""
        y_true, y_pred = random_batch(2)
        y = y_true[..., :2]
        w = y_true[..., 2:]
        loss = [0.35, 0.65] * w * y * (1 - y_pred) * (1 - y_pred) * np.log(y_pred + EPS)
        expected = -np.mean(loss.sum(-1))
        got = float(losses_mod.edge_focal_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
        assert got == pytest.approx(expected, rel=1e-6)

class TestMetrics:
    def test_against_numpy_confusion(self):
        y_true, y_pred = random_batch(4)
        yt = y_true[..., :2].argmax(-1)
        yp = y_pred.argmax(-1)
        tp = float(((yt == 1) & (yp == 1)).sum())
        tn = float(((yt == 0) & (yp == 0)).sum())
        fp = float(((yt == 0) & (yp == 1)).sum())
        fn = float(((yt == 1) & (yp == 0)).sum())
        m = metrics_mod.all_metrics(jnp.asarray(y_true), jnp.asarray(y_pred))
        assert float(m["PA"]) == pytest.approx((tp + tn) / (tp + tn + fp + fn + EPS))
        assert float(m["IoU"]) == pytest.approx(tp / (tp + fp + fn + EPS))
        iou1 = tn / (tn + fp + fn + EPS)
        assert float(m["MIoU"]) == pytest.approx(
            (tp / (tp + fp + fn + EPS) + iou1) / 2
        )
        prec, rec = tp / (tp + fp + EPS), tp / (tp + fn + EPS)
        assert float(m["F1_score"]) == pytest.approx(
            2 * prec * rec / (prec + rec + EPS)
        )


class TestSchedule:
    def test_warmup_cosine_matches_reference_formula(self):
        """res34.py:512-531, including the >= warmup boundary."""
        base, total, wlr, wsteps = 1e-3, 300, 1e-5, 30
        sched = warmup_cosine(base, total, wlr, wsteps)
        for step in [0, 1, 15, 29, 30, 31, 150, 299, 300]:
            if step >= wsteps:
                expected = 0.5 * base * (
                    1 + np.cos(np.pi * (step - wsteps) / float(total - wsteps))
                )
            else:
                k = (base - wlr) / wsteps
                expected = k * step + wlr
            expected = max(expected, 0)
            # schedule computes in f32 on device; 1e-9 absolute slack covers
            # rounding near the cosine zero
            assert float(sched(step)) == pytest.approx(expected, rel=1e-5, abs=1e-9), step

    def test_exponential(self):
        sched = exponential_decay(1e-3, 0.9)
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(5)) == pytest.approx(1e-3 * 0.9**5, rel=1e-6)


class TestKerasAdam:
    def test_matches_keras_update_rule(self):
        """train/optim.py::keras_adam vs a literal numpy transcription of
        tf_keras Adam (lr_t = lr*sqrt(1-b2^t)/(1-b1^t), raw eps on sqrt(v)).
        The full trajectory vs REAL tf_keras runs in
        scripts/tf_train_parity_probe.py (suite: test_tf_oracle.py)."""
        from building_detection_tpu.train.optim import keras_adam

        b1, b2, eps, lr = 0.9, 0.999, 1e-7, 1e-3
        rng = np.random.RandomState(7)
        p = {"w": rng.randn(5, 3).astype(np.float32)}
        tx = keras_adam(lr, b1=b1, b2=b2, eps=eps)
        state = tx.init({k: jnp.asarray(v) for k, v in p.items()})

        m = np.zeros_like(p["w"])
        v = np.zeros_like(p["w"])
        p_np = p["w"].copy()
        p_jx = {"w": jnp.asarray(p["w"])}
        for t in range(1, 6):
            g = rng.randn(5, 3).astype(np.float32)
            updates, state = tx.update({"w": jnp.asarray(g)}, state)
            p_jx = {"w": p_jx["w"] + updates["w"]}
            # numpy reference (f64 accumulation = tighter than both)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
            p_np = p_np - lr_t * m / (np.sqrt(v) + eps)
            np.testing.assert_allclose(
                np.asarray(p_jx["w"]), p_np, rtol=0, atol=2e-6
            )

    def test_epsilon_placement_differs_from_optax_adam(self):
        """The whole reason optim.py exists: on a tiny-gradient step the
        effective epsilon differs ~30x between the two forms (first step:
        optax eps vs keras eps/sqrt(1-b2)), so the updates must diverge."""
        import optax

        from building_detection_tpu.train.optim import keras_adam

        g = {"w": jnp.full((4,), 1e-6, jnp.float32)}
        p = {"w": jnp.zeros((4,), jnp.float32)}
        ka = keras_adam(1e-3)
        oa = optax.adam(1e-3, eps=1e-7)
        up_k, _ = ka.update(g, ka.init(p))
        up_o, _ = oa.update(g, oa.init(p), p)
        rel = float(
            jnp.max(jnp.abs(up_k["w"] - up_o["w"]) / jnp.abs(up_k["w"]))
        )
        assert rel > 0.01, f"expected measurable divergence, got rel={rel}"

    def test_callable_schedule_indexed_pre_increment(self):
        """Keras' on_batch_begin sets lr(global_step) with the 0-based
        PRE-increment step (res34.py:534-568); keras_adam must match."""
        from building_detection_tpu.train.optim import keras_adam

        seen = []

        def sched(count):
            seen.append(int(count))
            return 1e-3

        tx = keras_adam(sched)
        p = {"w": jnp.ones((2,), jnp.float32)}
        state = tx.init(p)
        for _ in range(3):
            _, state = tx.update({"w": jnp.ones((2,), jnp.float32)}, state)
        assert seen == [0, 1, 2]


class TestTargets:
    def test_matches_reference_recipe(self):
        """On-device y_true == the cv2 feeder recipe (res34.py:71-104)."""
        rng = np.random.RandomState(5)
        lab_u8 = np.where(rng.rand(2, 64, 64) < 0.4, 255, 0).astype(np.uint8)
        lab_u8 = np.stack(
            [cv.dilate(l, np.ones((3, 3), np.uint8)) for l in lab_u8]
        )
        got = np.asarray(make_targets(jnp.asarray(lab_u8), TrainConfig()))
        for i in range(2):
            label = lab_u8[i].astype(np.float32) / 255
            one_hot = np.stack([1 - (label == 1), (label == 1)], -1).astype(np.float32)
            kernel = np.ones((3, 3), np.uint8)
            erode = cv.erode(label, kernel, iterations=5)
            p_edge = np.where((label - erode) == 1, 2.0, 1.0)
            dilate = cv.dilate(label, kernel, iterations=5)
            f_edge = np.where((dilate - label) == 1, 2.0, 1.0)
            expected = np.concatenate(
                [one_hot, f_edge[..., None], p_edge[..., None]], -1
            )
            np.testing.assert_array_equal(got[i], expected)


def tiny_model(s, x):
    x = L.conv2d(s, x, 8, 3, activation="relu")
    x = L.batch_norm(s, x)
    return L.conv2d(s, x, 2, 1, activation="softmax")


class TestLoadWeights:
    """Weights-only init (`Trainer.load_weights`) — the reference's
    transfer-learning workflow: start from a pretrained ``.h5``
    (`predict.py:17-54` files) with a fresh optimizer/schedule."""

    def _data(self, n=8, hw=32, seed=0):
        rng = np.random.RandomState(seed)
        imgs = rng.randint(0, 256, (n, hw, hw, 3), np.uint8)
        labs = np.where(rng.rand(n, hw, hw) < 0.3, 255, 0).astype(np.uint8)
        return imgs, labs

    def _trainer(self):
        cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=32)
        return Trainer(tiny_model, cfg, steps_per_epoch=3)

    def test_init_from_h5_and_npz(self, tmp_path):
        from building_detection_tpu.train import checkpoint as ckpt

        imgs, labs = self._data()
        src = self._trainer()
        for _ in range(3):
            src.train_on_batch(imgs, labs)
        h5_path = str(tmp_path / "w.h5")
        npz_path = str(tmp_path / "w.npz")
        ckpt.export_h5_weights(
            h5_path, jax.device_get(src.params), jax.device_get(src.state)
        )
        src.save(npz_path)  # full checkpoint incl. optimizer + step

        for path in (h5_path, npz_path):
            dst = self._trainer()
            dst.load_weights(path)
            # weights match the source exactly ...
            sp, dp = jax.device_get(src.params), jax.device_get(dst.params)
            for k in sp:
                np.testing.assert_array_equal(sp[k], dp[k], err_msg=k)
            ss, ds = jax.device_get(src.state), jax.device_get(dst.state)
            for k in ss:
                np.testing.assert_array_equal(ss[k], ds[k], err_msg=k)
            # ... but the optimizer and step are FRESH (transfer learning,
            # not resume): step 0, zero Adam moments
            assert dst.step == 0
            mu = jax.device_get(dst.opt_state)
            flat = jax.tree_util.tree_leaves(mu)
            assert all(float(np.abs(np.asarray(l)).max()) == 0.0 for l in flat)
            # and fine-tuning proceeds from there
            m = dst.train_on_batch(imgs, labs)
            assert np.isfinite(m["loss"])

    def test_wrong_model_npz_raises(self, tmp_path):
        def other_model(s, x):
            x = L.conv2d(s, x, 4, 3, activation="relu")
            return L.conv2d(s, x, 2, 1, activation="softmax")

        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=32)
        src = Trainer(other_model, cfg, steps_per_epoch=1)
        path = str(tmp_path / "other.npz")
        src.save(path)
        dst = self._trainer()
        with pytest.raises(ValueError, match="does not match model"):
            dst.load_weights(path)


class TestTrainer:
    def make_data(self, n=8, hw=32, seed=0):
        rng = np.random.RandomState(seed)
        imgs = rng.randint(0, 256, (n, hw, hw, 3), np.uint8)
        labs = np.where(rng.rand(n, hw, hw) < 0.3, 255, 0).astype(np.uint8)
        return imgs, labs

    def make_trainer(self, tmp=None, hw=32):
        cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=hw)
        return Trainer(tiny_model, cfg, steps_per_epoch=3)

    def test_loss_decreases_and_checkpoints(self, tmp_path):
        tr = self.make_trainer(hw=32)
        imgs, labs = self.make_data()
        first = tr.train_on_batch(imgs, labs)
        losses = [first["loss"]]
        for _ in range(10):
            losses.append(tr.train_on_batch(imgs, labs)["loss"])
        assert losses[-1] < losses[0], losses
        assert 0 <= first["PA"] <= 1

        # checkpoint round trip, exact resume
        path = os.path.join(tmp_path, "ck.npz")
        tr.save(path)
        m_ref = tr.train_on_batch(imgs, labs)

        tr2 = self.make_trainer(hw=32)
        tr2.restore(path)
        assert tr2.step == tr.step - 1
        m_new = tr2.train_on_batch(imgs, labs)
        assert m_new["loss"] == pytest.approx(m_ref["loss"], rel=1e-5)

    def test_deferred_metrics_match_fetched(self):
        """fetch_metrics=False returns the same numbers, just unfetched —
        keeping the length-1 steps axis so no per-step eager slice programs
        are dispatched (glacial on the tunneled backend, CLAUDE.md)."""
        imgs, labs = self.make_data()
        tr_a = self.make_trainer()
        tr_b = self.make_trainer()
        for _ in range(3):
            ma = tr_a.train_on_batch(imgs, labs)
            mb = tr_b.train_on_batch(imgs, labs, fetch_metrics=False)
            for k, v in ma.items():
                assert mb[k].shape == (1,)
                assert float(np.asarray(mb[k]).ravel()[0]) == pytest.approx(
                    v, rel=1e-6
                )

    def test_train_on_batch_rejects_multistep_staged(self):
        """A staged (k>1, B, ...) array scans k optimizer steps but would
        advance self.step (LR schedule, augment key) by only 1 — must raise,
        directing to train_epoch_staged."""
        imgs, labs = self.make_data(n=16)
        tr = self.make_trainer()
        imgs5, labs4 = tr.stage_dataset(imgs, labs)
        assert imgs5.shape[0] == 2
        with pytest.raises(ValueError, match="train_epoch_staged"):
            tr.train_on_batch(imgs5, labs4)

    def test_restore_resumes_history(self, tmp_path):
        """history.json survives resume: the first checkpoint of a resumed
        run must append to the persisted record, not rewrite it from an
        empty list (round-3 review finding)."""
        import json

        imgs, labs = self.make_data(n=8)
        ckdir = str(tmp_path / "weights")
        os.makedirs(ckdir)
        tr = self.make_trainer()

        def it():
            while True:
                yield imgs, labs

        hist = tr.fit(it(), checkpoint_dir=ckdir, log_fn=lambda s: None)
        n_epochs = len(hist)
        assert n_epochs == tr.cfg.epochs

        tr2 = self.make_trainer()
        tr2.restore(os.path.join(ckdir, f"epoch_{n_epochs}_weights.npz"))
        assert [h["loss"] for h in tr2.history] == [h["loss"] for h in hist]
        tr2.fit(it(), checkpoint_dir=ckdir, log_fn=lambda s: None)
        with open(os.path.join(ckdir, "history.json")) as f:
            persisted = json.load(f)
        assert len(persisted) == 2 * n_epochs  # old record + resumed epochs
        assert [h["loss"] for h in persisted[:n_epochs]] == [
            h["loss"] for h in hist
        ]

        # restoring an OLDER epoch drops the stale tail of the record
        tr3 = self.make_trainer()
        tr3.restore(os.path.join(ckdir, "epoch_1_weights.npz"))
        assert len(tr3.history) == 1

    def test_staged_epoch_matches_stepwise(self):
        """The one-dispatch scan epoch must reproduce the step-by-step path:
        same params after the epoch, same per-step losses (same jitted body,
        VERDICT r1 item 1 'per-step losses unchanged')."""
        rng = np.random.RandomState(3)
        n_steps, b, hw = 4, 8, 32
        imgs = rng.randint(0, 256, (n_steps * b, hw, hw, 3), np.uint8)
        labs = np.where(rng.rand(n_steps * b, hw, hw) < 0.3, 255, 0).astype(np.uint8)

        tr_loop = self.make_trainer()
        loop_losses = [
            tr_loop.train_on_batch(
                imgs[i * b:(i + 1) * b], labs[i * b:(i + 1) * b]
            )["loss"]
            for i in range(n_steps)
        ]

        tr_scan = self.make_trainer()
        images_dev, labels_dev = tr_scan.stage_dataset(imgs, labs)
        metrics = tr_scan.train_epoch_staged(images_dev, labels_dev)
        assert metrics["loss"].shape == (n_steps,)
        # BIT-equal, not approx: train_on_batch executes the same compiled
        # scan body as the staged epoch (a separate standalone-step program
        # differs by ~1 ulp, which Adam amplifies chaotically at near-zero
        # gradients — Trainer.train_on_batch docstring)
        np.testing.assert_array_equal(
            np.asarray(metrics["loss"], np.float64), np.asarray(loop_losses)
        )
        assert tr_scan.step == tr_loop.step == n_steps
        # resulting parameters identical too
        pa = jax.device_get(tr_loop.params)
        pb = jax.device_get(tr_scan.params)
        for k in pa:
            np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)

    def test_staged_shuffle_order_matches_manual_visit_order(self):
        """``order`` permutes WHICH staged batch each scan step trains on
        while the step counter (LR, augment key) advances sequentially —
        so a shuffled staged epoch must be bit-equal to train_on_batch
        visiting the batches in that same order."""
        rng = np.random.RandomState(11)
        n_steps, b, hw = 4, 8, 32
        imgs = rng.randint(0, 256, (n_steps * b, hw, hw, 3), np.uint8)
        labs = np.where(rng.rand(n_steps * b, hw, hw) < 0.3, 255, 0).astype(np.uint8)
        order = np.array([2, 0, 3, 1], np.int32)

        tr_loop = self.make_trainer()
        loop_losses = [
            tr_loop.train_on_batch(
                imgs[i * b:(i + 1) * b], labs[i * b:(i + 1) * b]
            )["loss"]
            for i in order
        ]

        tr_scan = self.make_trainer()
        images_dev, labels_dev = tr_scan.stage_dataset(imgs, labs)
        metrics = tr_scan.train_epoch_staged(images_dev, labels_dev, order=order)
        np.testing.assert_array_equal(
            np.asarray(metrics["loss"], np.float64), np.asarray(loop_losses)
        )
        pa = jax.device_get(tr_loop.params)
        pb = jax.device_get(tr_scan.params)
        for k in pa:
            np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)

    def test_staged_order_must_be_permutation(self):
        rng = np.random.RandomState(12)
        imgs = rng.randint(0, 256, (16, 32, 32, 3), np.uint8)
        labs = np.where(rng.rand(16, 32, 32) < 0.3, 255, 0).astype(np.uint8)
        tr = self.make_trainer()
        dev = tr.stage_dataset(imgs, labs)
        with pytest.raises(ValueError, match="permutation"):
            tr.train_epoch_staged(*dev, order=np.array([0, 0], np.int32))
        with pytest.raises(ValueError, match="permutation"):
            tr.train_epoch_staged(*dev, order=np.array([1], np.int32))

    def test_fit_arrays_shuffle_deterministic(self, tmp_path):
        """shuffle=True is seeded end-to-end: two identical runs produce
        identical histories, and a different seed produces a different
        batch composition (first-epoch losses differ)."""
        rng = np.random.RandomState(13)
        imgs = rng.randint(0, 256, (32, 32, 32, 3), np.uint8)
        labs = np.where(rng.rand(32, 32, 32) < 0.3, 255, 0).astype(np.uint8)

        def run(seed):
            cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=32)
            tr = Trainer(tiny_model, cfg, steps_per_epoch=4)
            return tr.fit_arrays(
                imgs, labs, shuffle=True, shuffle_seed=seed,
                log_fn=lambda s: None,
            )

        h1, h2, h3 = run(0), run(0), run(1)
        assert [h["loss"] for h in h1] == [h["loss"] for h in h2]
        assert [h["loss"] for h in h1] != [h["loss"] for h in h3]

    def test_streamed_shuffle_keeps_validation_fixed_order(self):
        """Validation batches must NOT be shuffled: per-batch-averaged
        IoU/F1 are not permutation-invariant, so reshuffled val
        composition would make epoch val metrics incomparable.  Train is a
        single batch here (shuffle only permutes samples within it, which
        changes nothing beyond summation-order ulps), and the two val
        batches have wildly different positive densities — if shuffle
        leaked into validation, the per-batch IoUs (and their mean) would
        shift far beyond ulp noise."""
        rng = np.random.RandomState(14)
        imgs = rng.randint(0, 256, (8, 32, 32, 3), np.uint8)
        labs = np.where(rng.rand(8, 32, 32) < 0.3, 255, 0).astype(np.uint8)
        vimgs = rng.randint(0, 256, (16, 32, 32, 3), np.uint8)
        vlabs = np.concatenate([
            np.where(rng.rand(8, 32, 32) < 0.95, 255, 0),  # dense batch
            np.where(rng.rand(8, 32, 32) < 0.02, 255, 0),  # sparse batch
        ]).astype(np.uint8)

        def run(shuffle):
            cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=32)
            tr = Trainer(tiny_model, cfg, steps_per_epoch=1)
            return tr.fit_arrays(
                imgs, labs, vimgs, vlabs, stage="stream",
                shuffle=shuffle, shuffle_seed=0, log_fn=lambda s: None,
            )

        h_off, h_on = run(False), run(True)
        for a, b in zip(h_off, h_on):
            np.testing.assert_allclose(
                [a["val_IoU"], a["val_loss"]],
                [b["val_IoU"], b["val_loss"]], rtol=1e-4,
            )

    def test_remat_matches_plain(self):
        """jax.checkpoint remat changes memory, not numerics."""
        imgs, labs = self.make_data()
        cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=32)
        tr_a = Trainer(tiny_model, cfg, steps_per_epoch=3)
        tr_b = Trainer(tiny_model, cfg, steps_per_epoch=3, remat=True)
        for _ in range(3):
            ma = tr_a.train_on_batch(imgs, labs)
            mb = tr_b.train_on_batch(imgs, labs)
            assert mb["loss"] == pytest.approx(ma["loss"], rel=1e-6)

    def test_stage_dataset_drops_remainder(self):
        imgs, labs = self.make_data(n=19)
        tr = self.make_trainer()
        images_dev, labels_dev = tr.stage_dataset(imgs, labs)
        assert images_dev.shape[:2] == (2, 8)
        assert labels_dev.shape[:2] == (2, 8)

    def test_device_prefetch_roundtrip(self):
        from building_detection_tpu.data.dataset import device_prefetch

        imgs, labs = self.make_data()
        tr = self.make_trainer()

        def it():
            for _ in range(3):
                yield imgs, labs

        got = list(device_prefetch(it(), tr.mesh))
        assert len(got) == 3
        for di, dl in got:
            assert isinstance(di, jax.Array)
            np.testing.assert_array_equal(np.asarray(di), imgs)
            np.testing.assert_array_equal(np.asarray(dl), labs)
        # and the trainer accepts pre-staged device batches directly
        m = tr.train_on_batch(*got[0])
        assert np.isfinite(m["loss"])

    def test_fit_loop_saves_per_epoch(self, tmp_path):
        tr = self.make_trainer(hw=32)
        imgs, labs = self.make_data()

        def it():
            while True:
                yield imgs, labs

        hist = tr.fit(
            it(), val_iter=it(), val_steps=1, checkpoint_dir=str(tmp_path),
            log_fn=lambda s: None,
        )
        assert len(hist) == 2
        assert "val_PA" in hist[0] and "lr" in hist[0]
        assert sorted(os.path.basename(p) for p in glob.glob(str(tmp_path) + "/*.npz")) == [
            "epoch_1_weights.npz",
            "epoch_2_weights.npz",
        ]

    def test_fit_arrays_staged_matches_stream(self, tmp_path):
        """The user-facing fit entry delivers the staged path (VERDICT r2
        item 4) with numerics identical to the streamed per-step loop."""
        rng = np.random.RandomState(11)
        n, hw = 16, 32
        imgs = rng.randint(0, 256, (n, hw, hw, 3), np.uint8)
        labs = np.where(rng.rand(n, hw, hw) < 0.3, 255, 0).astype(np.uint8)

        tr_staged = self.make_trainer()
        h_staged = tr_staged.fit_arrays(
            imgs, labs, checkpoint_dir=str(tmp_path / "a"),
            log_fn=lambda s: None, stage="staged",
        )
        tr_stream = self.make_trainer()
        h_stream = tr_stream.fit_arrays(
            imgs, labs, checkpoint_dir=str(tmp_path / "b"),
            log_fn=lambda s: None, stage="stream",
        )
        assert len(h_staged) == len(h_stream) == 2
        for a, b in zip(h_staged, h_stream):
            assert a["loss"] == b["loss"]  # same compiled scan body: bitwise
        pa = jax.device_get(tr_staged.params)
        pb = jax.device_get(tr_stream.params)
        for k in pa:
            np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)
        assert glob.glob(str(tmp_path / "a") + "/*.npz")
        # fit history persisted next to the checkpoints on BOTH paths
        import json
        for d in ("a", "b"):
            hist = json.load(open(str(tmp_path / d / "history.json")))
            assert len(hist) == 2 and "loss" in hist[0]

    def test_fit_arrays_auto_respects_budget(self, monkeypatch):
        """auto mode stages iff the dataset fits the reported free HBM."""
        imgs, labs = self.make_data()
        tr = self.make_trainer()
        monkeypatch.setattr(tr, "_hbm_bytes_free", lambda: 1)
        assert not tr.should_stage(imgs, labs)
        monkeypatch.setattr(tr, "_hbm_bytes_free", lambda: 1 << 40)
        assert tr.should_stage(imgs, labs)
        monkeypatch.setattr(tr, "_hbm_bytes_free", lambda: None)
        assert tr.should_stage(imgs, labs)  # unreported -> assume fits

    def test_should_stage_counts_validation_arrays(self, monkeypatch):
        """fit_arrays device_puts the val set alongside the staged epochs, so
        auto mode must budget for it: a train set that fits alone but not
        with the val set falls back to streaming instead of OOMing."""
        imgs, labs = self.make_data()
        tr = self.make_trainer()
        need = imgs.nbytes + labs.nbytes
        n_data = tr.mesh.shape.get("data", 1)
        free = int((need / n_data) / 0.6) + 1  # train alone just fits
        monkeypatch.setattr(tr, "_hbm_bytes_free", lambda: free)
        assert tr.should_stage(imgs, labs)
        assert not tr.should_stage(imgs, labs, extra_arrays=(imgs, labs))
        assert tr.should_stage(imgs, labs, extra_arrays=(None, None))

    def test_augment_in_step_staged_matches_stepwise(self):
        """On-device per-step augmentation keys on the global step, so the
        staged scan epoch and the step loop see identical augmented batches
        (and thus identical losses/params)."""
        rng = np.random.RandomState(13)
        n_steps, b, hw = 3, 8, 32
        imgs = rng.randint(0, 256, (n_steps * b, hw, hw, 3), np.uint8)
        labs = np.where(rng.rand(n_steps * b, hw, hw) < 0.3, 255, 0).astype(np.uint8)
        cfg = TrainConfig(batch_size=b, epochs=1, warmup_epochs=1, image_size=hw)

        tr_loop = Trainer(tiny_model, cfg, steps_per_epoch=n_steps,
                          augment=True, augment_seed=5)
        loop_losses = [
            tr_loop.train_on_batch(
                imgs[i * b:(i + 1) * b], labs[i * b:(i + 1) * b]
            )["loss"]
            for i in range(n_steps)
        ]
        tr_scan = Trainer(tiny_model, cfg, steps_per_epoch=n_steps,
                          augment=True, augment_seed=5)
        metrics = tr_scan.train_epoch_staged(*tr_scan.stage_dataset(imgs, labs))
        np.testing.assert_array_equal(  # one compiled scan body: bitwise
            np.asarray(metrics["loss"], np.float64), np.asarray(loop_losses)
        )
        pa = jax.device_get(tr_loop.params)
        pb = jax.device_get(tr_scan.params)
        for k in pa:
            np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)

    def test_augment_changes_batches_but_not_determinism(self):
        """Same seed -> same run; augmentation actually perturbs the loss."""
        imgs, labs = self.make_data()
        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=32)
        l_plain = Trainer(tiny_model, cfg, steps_per_epoch=1).train_on_batch(imgs, labs)["loss"]
        a = Trainer(tiny_model, cfg, steps_per_epoch=1, augment=True, augment_seed=1)
        b = Trainer(tiny_model, cfg, steps_per_epoch=1, augment=True, augment_seed=1)
        la = a.train_on_batch(imgs, labs)["loss"]
        lb = b.train_on_batch(imgs, labs)["loss"]
        assert la == pytest.approx(lb, rel=1e-7)
        assert la != pytest.approx(l_plain, rel=1e-7)
