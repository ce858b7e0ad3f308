"""Multi-process (multi-host) data-parallel training.

The reference is single-GPU/single-process (SURVEY.md section 2.3); the
framework's scale-out beyond one host is `parallel/distributed.py`:
``jax.distributed`` bring-up, per-host data feeding, single-writer
checkpoints.  Two layers of validation:

* in-process (single-process degenerate case): the per-host feeding helpers
  must collapse exactly onto the existing single-process paths;
* a REAL 2-process run (subprocesses, 4 virtual CPU devices each, Gloo
  cross-process collectives — the pod execution shape without a pod)
  training the same tiny model as a single-process 8-device mesh, asserting
  replicated results agree across processes bitwise and match the
  single-process run to float noise (different collective reduction order;
  see parallel/distributed.py docstring).
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from building_detection_tpu.core.config import TrainConfig
from building_detection_tpu.nn import layers as L
from building_detection_tpu.parallel import distributed as dist
from building_detection_tpu.train import checkpoint as ckpt
from building_detection_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_model(s, x):
    x = L.conv2d(s, x, 8, 3, activation="relu")
    x = L.batch_norm(s, x)
    return L.conv2d(s, x, 2, 1, activation="softmax")


def _data(n=32, hw=16, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (n, hw, hw, 3), np.uint8)
    labs = np.where(rng.rand(n, hw, hw) < 0.3, 255, 0).astype(np.uint8)
    return imgs, labs


class TestSingleProcessDegenerate:
    """The multi-host helpers under one process == the existing paths."""

    def test_local_sample_indices_identity(self):
        tr = Trainer(tiny_model, TrainConfig(batch_size=8, image_size=16),
                     steps_per_epoch=1)
        idx = dist.local_sample_indices(20, 8, tr.mesh)
        # 2 complete batches of 8; one process owns every row, feeding order
        np.testing.assert_array_equal(idx, np.arange(16))

    def test_stage_local_equals_stage_dataset(self):
        imgs, labs = _data()
        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=16)
        tr = Trainer(tiny_model, cfg, steps_per_epoch=4)
        a_i, a_l = tr.stage_dataset(imgs, labs)
        idx = dist.local_sample_indices(len(imgs), cfg.batch_size, tr.mesh)
        b_i, b_l = dist.stage_local_dataset(tr, imgs[idx], labs[idx])
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_array_equal(np.asarray(a_l), np.asarray(b_l))

    def test_fit_from_process_local_degenerate(self):
        """fit(from_process_local=True) under one process == plain fit,
        bitwise (global_from_local degenerates to the same transfer)."""
        imgs, labs = _data()
        cfg = TrainConfig(batch_size=8, epochs=1, warmup_epochs=1, image_size=16)

        def stream():
            while True:
                for k in range(4):
                    yield imgs[k * 8 : (k + 1) * 8], labs[k * 8 : (k + 1) * 8]

        a = Trainer(tiny_model, cfg, steps_per_epoch=4)
        b = Trainer(tiny_model, cfg, steps_per_epoch=4)
        a.fit(stream(), log_fn=lambda m: None)
        b.fit(stream(), log_fn=lambda m: None, from_process_local=True)
        for ka, kb in zip(
            jax.tree_util.tree_leaves(a.params), jax.tree_util.tree_leaves(b.params)
        ):
            np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))

    def test_fit_arrays_accepts_pre_staged(self, tmp_path):
        """fit_arrays on pre-staged device arrays == fit_arrays on host
        arrays, bitwise (same compiled epoch program, same batches)."""
        imgs, labs = _data()
        cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=16)
        a = Trainer(tiny_model, cfg, steps_per_epoch=4)
        b = Trainer(tiny_model, cfg, steps_per_epoch=4)
        ha = a.fit_arrays(imgs, labs, stage="staged", log_fn=lambda m: None)
        hb = b.fit_arrays(*b.stage_dataset(imgs, labs), log_fn=lambda m: None)
        for ka, kb in zip(
            jax.tree_util.tree_leaves(a.params), jax.tree_util.tree_leaves(b.params)
        ):
            np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))
        assert [h["loss"] for h in ha] == [h["loss"] for h in hb]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cli_workers(args_for, tmp_path, extra_env=None, timeout=600):
    """Launch 2 real ``bdt-train`` processes (the SHIPPED CLI wiring:
    --coordinator/--num-processes/--process-id) on 4 virtual CPU devices
    each.  The -c wrapper only forces the CPU platform (this box pins a TPU
    backend via sitecustomize; a real pod user needs no such step) — argv
    parsing, init_distributed, per-host feeding and the guards all run
    through ``cli.train.main`` exactly as shipped."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env or {})
    wrapper = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        "from building_detection_tpu.cli.train import main; "
        "raise SystemExit(main(sys.argv[1:]))"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", wrapper] + args_for(i),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    return [(p.returncode, out) for p, out in zip(procs, outs)]


GLOO_SKIP_MARKER = os.environ.get(
    "BDT_GLOO_SKIP_MARKER", "/tmp/bdt_gloo_skipped.json"
)

_GLOO_INFRA_MARKERS = (
    "Barrier timed out", "DEADLINE_EXCEEDED", "CoordinationService",
    "coordination service", "Shutdown barrier",
    "Gloo context initialization failed",
)


def _record_gloo_skip(test_name: str, reason: str) -> None:
    """Machine-readable record that a 2-process leg did NOT run (VERDICT r4
    item 6: a green suite must not silently lose its only real
    cross-process coverage).  Appends to GLOO_SKIP_MARKER; conftest clears
    the file at session start, so after a run `no marker == the legs ran`."""
    import time

    entries = []
    try:
        with open(GLOO_SKIP_MARKER) as f:
            entries = json.load(f)
    except (OSError, ValueError):
        pass
    entries.append({
        "test": test_name,
        "reason": reason[:500],
        "time": time.time(),
    })
    tmp = GLOO_SKIP_MARKER + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entries, f, indent=1)
    os.replace(tmp, GLOO_SKIP_MARKER)


def _with_infra_retry(fn, attempts=3):
    """Re-run a 2-process check that failed on Gloo COORDINATION noise.

    Under a heavily loaded box a worker can be CPU-starved past the
    distributed runtime's HARD deadlines — Gloo's KV exchange
    (`GetKeyValue() timed out ... 30s`, not configurable from Python) and
    the init/shutdown barriers — and die with DEADLINE_EXCEEDED before the
    behavior under test even runs (observed: full suite + a concurrent TF
    training saturating every core).  That is infrastructure weather, not
    the property being tested: retry, and if EVERY attempt dies with pure
    coordination noise, skip with the diagnosis instead of reporting a
    false failure — LOUDLY: the skip is recorded in GLOO_SKIP_MARKER, and
    ``BDT_GLOO_STRICT=1`` (CI contexts) turns it into a hard failure.
    Real assertion failures (markers absent) re-raise immediately — a
    genuine CLI/trainer regression cannot produce these markers without
    also failing the standalone assertions."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except AssertionError as e:
            msg = str(e)
            if not any(m in msg for m in _GLOO_INFRA_MARKERS):
                raise
            last = e
    diagnosis = (
        "2-process Gloo bring-up starved past its hard 30s deadlines on "
        f"every attempt (overloaded box): {str(last)[:300]}"
    )
    import inspect

    caller = inspect.stack()[1].function
    _record_gloo_skip(caller, diagnosis)
    if os.environ.get("BDT_GLOO_STRICT") == "1":
        raise AssertionError(
            f"BDT_GLOO_STRICT=1: refusing to skip the 2-process leg — "
            + diagnosis
        )
    pytest.skip(diagnosis)


class TestGlooSkipMarker:
    """The infra-skip must be LOUD: machine-readable marker + strict mode
    (VERDICT r4 item 6)."""

    def test_exhausted_infra_retries_skip_and_record(self, tmp_path, monkeypatch):
        import test_distributed as td

        marker = str(tmp_path / "gloo.json")
        monkeypatch.setattr(td, "GLOO_SKIP_MARKER", marker)
        calls = []

        def starved():
            calls.append(1)
            raise AssertionError("... DEADLINE_EXCEEDED: Barrier timed out ...")

        with pytest.raises(pytest.skip.Exception):
            td._with_infra_retry(starved, attempts=2)
        assert len(calls) == 2
        with open(marker) as f:
            entries = json.load(f)
        assert len(entries) == 1
        assert "DEADLINE_EXCEEDED" in entries[0]["reason"]
        assert entries[0]["test"] == "test_exhausted_infra_retries_skip_and_record"

    def test_strict_mode_fails_instead_of_skipping(self, tmp_path, monkeypatch):
        import test_distributed as td

        monkeypatch.setattr(td, "GLOO_SKIP_MARKER", str(tmp_path / "g.json"))
        monkeypatch.setenv("BDT_GLOO_STRICT", "1")

        def starved():
            raise AssertionError("CoordinationService went away")

        with pytest.raises(AssertionError, match="refusing to skip"):
            td._with_infra_retry(starved, attempts=1)

    def test_real_failures_reraise_without_marker(self, tmp_path, monkeypatch):
        import test_distributed as td

        marker = str(tmp_path / "g.json")
        monkeypatch.setattr(td, "GLOO_SKIP_MARKER", marker)
        calls = []

        def broken():
            calls.append(1)
            raise AssertionError("checkpoint file missing")

        with pytest.raises(AssertionError, match="checkpoint file missing"):
            td._with_infra_retry(broken, attempts=3)
        assert len(calls) == 1  # no retry burn on real regressions
        assert not os.path.exists(marker)


def _write_pairs(tmp_path, n=32, size=16):
    from building_detection_tpu.utils import io as uio

    img_dir = tmp_path / "imgs"
    lab_dir = tmp_path / "labs"
    img_dir.mkdir(exist_ok=True)
    lab_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 256, (size, size, 3), np.uint8)
        lab = np.where(rng.rand(size, size) < 0.3, 255, 0).astype(np.uint8)
        uio.imwrite(str(img_dir / f"{i:03d}.png"), img)
        uio.imwrite(str(lab_dir / f"{i:03d}.png"), lab)
    return str(img_dir), str(lab_dir)


class TestTwoProcessCli:
    """VERDICT r3 item 3: multi-host driven through the SHIPPED CLI, not just
    the library helpers — staged AND streamed datasets, single writer, and
    the too-small-dataset error paths."""

    def _base_args(self, img_dir, lab_dir, port, ckpt_root):
        def args_for(i):
            return [
                "res34",
                "--train-images", img_dir,
                "--train-labels", lab_dir,
                "--checkpoint-dir", os.path.join(ckpt_root, f"p{i}"),
                "--batch-size", "8",
                "--epochs", "2",
                "--warmup-epochs", "1",
                "--image-size", "16",
                "--precision", "f32",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2",
                "--process-id", str(i),
            ]
        return args_for

    def test_cli_staged_and_streamed_match_bitwise(self, tmp_path):
        img_dir, lab_dir = _write_pairs(tmp_path)
        attempt = [0]

        def run_path(kind, extra_env):
            root = str(tmp_path / f"{kind}{attempt[0]}")
            res = _run_cli_workers(
                self._base_args(img_dir, lab_dir, _free_port(), root),
                tmp_path, extra_env=extra_env,
            )
            for rc, out in res:
                assert rc == 0, f"{kind} CLI worker failed:\n{res}"
            marker = "feeding" if kind == "staged" else "streaming"
            assert any(f"{marker} 16 samples" in out for _, out in res), res
            # exactly one writer: p0's dir has the files, p1's has nothing
            ckpt = os.path.join(root, "p0", "epoch_2_weights.npz")
            assert os.path.exists(ckpt)
            assert os.path.exists(os.path.join(root, "p0", "history.json"))
            p1 = os.path.join(root, "p1")
            assert not os.path.exists(p1) or os.listdir(p1) == []
            return ckpt

        def staged():
            return run_path("staged", None)

        def streamed():
            return run_path("streamed", {"BDT_HOST_DECODE_BUDGET": "0"})

        attempt[0] += 1
        staged_ckpt = _with_infra_retry(staged)
        attempt[0] += 1
        streamed_ckpt = _with_infra_retry(streamed)

        # staged and streamed are THE SAME training trajectory: bit-identical
        # final checkpoints (the staged==per-step bit-equality contract,
        # docs/ARCHITECTURE.md, now proven through the shipped CLI)
        a = np.load(staged_ckpt, allow_pickle=False)
        b = np.load(streamed_ckpt, allow_pickle=False)
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def _check_too_small(self, tmp_path, extra_env):
        img_dir, lab_dir = _write_pairs(tmp_path, n=4)
        attempt = [0]

        def check():
            attempt[0] += 1
            res = _run_cli_workers(
                self._base_args(
                    img_dir, lab_dir, _free_port(),
                    str(tmp_path / f"ck{attempt[0]}"),
                ),
                tmp_path, extra_env=extra_env,
            )
            rcs = [rc for rc, _ in res]
            assert any(rc != 0 for rc in rcs), res
            assert any(
                "at least one complete global batch" in out for _, out in res
            ), res
        _with_infra_retry(check)

    def test_cli_too_small_dataset_fails_actionably_staged(self, tmp_path):
        self._check_too_small(tmp_path, None)

    def test_cli_too_small_dataset_fails_actionably_streamed(self, tmp_path):
        self._check_too_small(tmp_path, {"BDT_HOST_DECODE_BUDGET": "0"})


class TestTwoProcess:
    def test_two_process_dp_matches_single_process(self, tmp_path):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        worker = os.path.join(REPO, "tests", "_distributed_worker.py")
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out}"

        # both processes hold bit-identical replicated results
        p0 = ckpt.load_variables(str(tmp_path / "params_p0.npz"))
        p1 = ckpt.load_variables(str(tmp_path / "params_p1.npz"))
        l0 = jax.tree_util.tree_leaves((p0[0], p0[1]))
        l1 = jax.tree_util.tree_leaves((p1[0], p1[1]))
        assert len(l0) == len(l1) and len(l0) > 0
        for x, y in zip(l0, l1):
            np.testing.assert_array_equal(x, y)
        assert p0[3] == 8  # 2 epochs x 4 steps

        # single-process 8-device mesh, identical data/config/seed
        imgs, labs = _data()
        cfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, image_size=16)
        tr = Trainer(tiny_model, cfg, steps_per_epoch=4)
        hist = tr.fit_arrays(
            imgs, labs, val_images=imgs[:8], val_labels=labs[:8],
            stage="staged", log_fn=lambda m: None,
        )
        ref = jax.tree_util.tree_leaves(
            (jax.device_get(tr.params), jax.device_get(tr.state))
        )
        # cross-process all-reduce orders reductions differently than the
        # single-process program -> float noise, amplified a little by Adam
        for x, y in zip(ref, l0):
            np.testing.assert_allclose(x, y, rtol=0, atol=2e-4)
        with open(tmp_path / "history_p0.json") as f:
            hist2 = json.load(f)
        assert len(hist2) == len(hist) == 2
        for a, b in zip(hist, hist2):
            assert abs(a["loss"] - b["loss"]) < 1e-4
            assert abs(a["val_IoU"] - b["val_IoU"]) < 1e-3
        # exactly one writer: workers use per-process checkpoint dirs, so a
        # regression where every process writes cannot hide behind same-name
        # overwrites — the primary's dir has the files, p1's has NOTHING
        assert (tmp_path / "ckpt_p0" / "epoch_2_weights.npz").exists()
        assert (tmp_path / "ckpt_p0" / "history.json").exists()
        p1_dir = tmp_path / "ckpt_p1"
        p1_writes = list(p1_dir.iterdir()) if p1_dir.exists() else []
        assert p1_writes == [], f"non-primary process wrote: {p1_writes}"

        # streamed multi-host phase (per-process batch generators through
        # Trainer.fit(from_process_local=True)): both processes bit-equal,
        # and to float noise of a single-process streamed run
        s0 = ckpt.load_variables(str(tmp_path / "params_p0_stream.npz"))
        s1 = ckpt.load_variables(str(tmp_path / "params_p1_stream.npz"))
        sl0 = jax.tree_util.tree_leaves((s0[0], s0[1]))
        sl1 = jax.tree_util.tree_leaves((s1[0], s1[1]))
        for x, y in zip(sl0, sl1):
            np.testing.assert_array_equal(x, y)

        def stream():
            while True:
                for k in range(4):
                    yield imgs[k * 8 : (k + 1) * 8], labs[k * 8 : (k + 1) * 8]

        tr2 = Trainer(tiny_model, cfg, steps_per_epoch=4)
        tr2.fit(stream(), log_fn=lambda m: None)
        sref = jax.tree_util.tree_leaves(
            (jax.device_get(tr2.params), jax.device_get(tr2.state))
        )
        for x, y in zip(sref, sl0):
            np.testing.assert_allclose(x, y, rtol=0, atol=2e-4)
