"""CLI entry points end-to-end (argv in, files out) at toy sizes.

The reference's user surface is its script ``__main__`` blocks
(`/root/reference/predict.py:135-179`, `train_model/*.py`,
`data_enhancement.py:218-232`); these tests drive our equivalents —
``bdt-predict`` / ``bdt-train`` / ``bdt-eval`` / ``bdt-augment`` — through
``main(argv)`` with tiny images and a small-tile config so the real model
zoo stays CPU-affordable (the serving CLI is covered by test_serve.py).
"""
import json
import os

import numpy as np
import pytest

from building_detection_tpu.utils import io as uio


def write_pairs(tmp_path, n=4, size=16, name="train"):
    img_dir = tmp_path / f"{name}_images"
    lab_dir = tmp_path / f"{name}_labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 256, (size, size, 3), np.uint8)
        lab = np.where(rng.rand(size, size) < 0.4, 255, 0).astype(np.uint8)
        uio.imwrite(str(img_dir / f"{i}.png"), img)
        uio.imwrite(str(lab_dir / f"{i}.png"), lab)
    return str(img_dir), str(lab_dir)


class TestTrainEvalCli:
    def test_train_then_eval_roundtrip(self, tmp_path):
        """bdt-train (fit_arrays path) writes per-epoch checkpoints; bdt-eval
        loads one and reports finite PA/IoU/MIoU/F1 (the metrics the
        reference only shows live during fit, `res34.py:663-678`)."""
        from building_detection_tpu.cli import evaluate as eval_cli
        from building_detection_tpu.cli import train as train_cli

        img_dir, lab_dir = write_pairs(tmp_path, n=4, size=16)
        ckpt_dir = str(tmp_path / "weights")
        rc = train_cli.main([
            "res34",
            "--train-images", img_dir,
            "--train-labels", lab_dir,
            "--checkpoint-dir", ckpt_dir,
            "--batch-size", "2",
            "--epochs", "1",
            "--warmup-epochs", "1",
            "--image-size", "16",
            "--precision", "f32",
            "--data-parallel", "1",
        ])
        assert rc == 0
        ckpt = os.path.join(ckpt_dir, "epoch_1_weights.npz")
        assert os.path.exists(ckpt)

        rc = eval_cli.main([
            "res34",
            "--checkpoint", ckpt,
            "--images", img_dir,
            "--labels", lab_dir,
            "--batch-size", "2",
            "--image-size", "16",
            "--precision", "f32",
        ])
        assert rc == 0

    def test_train_auto_resume(self, tmp_path):
        """--auto-resume picks the newest epoch checkpoint (the reference has
        no resume at all; scheduler global_step_init is never wired,
        `res34.py:463`)."""
        from building_detection_tpu.cli import train as train_cli

        img_dir, lab_dir = write_pairs(tmp_path, n=4, size=16)
        ckpt_dir = str(tmp_path / "weights")
        base = [
            "res34",
            "--train-images", img_dir,
            "--train-labels", lab_dir,
            "--checkpoint-dir", ckpt_dir,
            "--batch-size", "2",
            "--epochs", "1",
            "--warmup-epochs", "1",
            "--image-size", "16",
            "--precision", "f32",
            "--data-parallel", "1",
        ]
        assert train_cli.main(base) == 0
        assert train_cli.main(base + ["--auto-resume"]) == 0

    def test_convert_and_init_weights_transfer(self, tmp_path):
        """bdt-convert round-trips npz <-> reference-format .h5, and
        bdt-train --init-weights fine-tunes from the .h5 — the reference's
        transfer-learning story (WHU-pretrained weights -> lab data,
        `/root/reference/README.md:7`, loaded via `predict.py:17-54`)."""
        import numpy as np

        from building_detection_tpu.cli import convert as convert_cli
        from building_detection_tpu.cli import train as train_cli

        img_dir, lab_dir = write_pairs(tmp_path, n=4, size=16)
        pretrain_dir = str(tmp_path / "pretrain")
        base = [
            "res34",
            "--train-images", img_dir,
            "--train-labels", lab_dir,
            "--batch-size", "2",
            "--epochs", "1",
            "--warmup-epochs", "1",
            "--image-size", "16",
            "--precision", "f32",
            "--data-parallel", "1",
        ]
        assert train_cli.main(base + ["--checkpoint-dir", pretrain_dir]) == 0
        npz = os.path.join(pretrain_dir, "epoch_1_weights.npz")

        # npz -> reference-format .h5 and back: weights bit-identical
        h5 = str(tmp_path / "resnet34.h5")
        npz2 = str(tmp_path / "back.npz")
        assert convert_cli.main(["res34", npz, h5, "--image-size", "16"]) == 0
        assert convert_cli.main(["res34", h5, npz2, "--image-size", "16"]) == 0
        with np.load(npz) as a, np.load(npz2) as b:
            for key in a.files:
                if key.startswith(("params||", "state||")):
                    np.testing.assert_array_equal(a[key], b[key], err_msg=key)

        # fine-tune from the .h5 with a fresh optimizer
        finetune_dir = str(tmp_path / "finetune")
        assert train_cli.main(
            base + ["--checkpoint-dir", finetune_dir, "--init-weights", h5]
        ) == 0
        assert os.path.exists(os.path.join(finetune_dir, "epoch_1_weights.npz"))

        # --init-weights + resume is a contradiction and must fail loudly
        with pytest.raises(SystemExit):
            train_cli.main(
                base + [
                    "--checkpoint-dir", finetune_dir,
                    "--init-weights", h5,
                    "--auto-resume",
                ]
            )

        # wrong-model direction fails loudly too (hrnet pytrees != res34 npz)
        with pytest.raises(SystemExit):
            convert_cli.main(["hrnet", npz, str(tmp_path / "x.h5"), "--image-size", "16"])


class TestPredictCli:
    def test_directory_mode_writes_contract_files(self, tmp_path, capsys):
        """Reference mode '2' (`predict.py:137,156-179`): a directory of
        scenes -> per-scene result mask + corner txt; --keep-intermediates
        keeps the per-model masks the reference deletes."""
        from building_detection_tpu.cli import predict as predict_cli
        from building_detection_tpu.core.config import Config

        import dataclasses

        cfg = dataclasses.replace(
            Config(),
            tiler=dataclasses.replace(
                Config().tiler, tile=32, stride=24, overlap=8
            ),
        )
        cfg_path = str(tmp_path / "cfg.json")
        cfg.to_json(cfg_path)

        scene_dir = tmp_path / "scenes"
        scene_dir.mkdir()
        rng = np.random.RandomState(1)
        for name in ["a", "b"]:
            uio.imwrite(
                str(scene_dir / f"{name}.png"),
                rng.randint(0, 256, (48, 40, 3), np.uint8),
            )
        out_dir = str(tmp_path / "out")
        rc = predict_cli.main([
            "--image-dir", str(scene_dir),
            "--out", out_dir,
            "--config", cfg_path,
            "--batch-tiles", "4",
            "--precision", "f32",
            "--keep-intermediates",
        ])
        assert rc == 0
        for name in ["a", "b"]:
            assert os.path.exists(
                os.path.join(out_dir, name, f"{name}_result.png")
            )
            assert os.path.exists(os.path.join(out_dir, name, f"{name}.txt"))
            # per-model intermediates kept for all five members
            pngs = os.listdir(os.path.join(out_dir, name))
            assert sum(p.endswith(f"_{name}.png") for p in pngs) == 5
        # one JSON status line per image on stdout
        lines = [
            json.loads(l)
            for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")
        ]
        assert len(lines) == 2 and all("num_buildings" in l for l in lines)

    def test_chunked_directory_equals_single_chunk(self, tmp_path):
        """--chunk-scenes bounds host memory on big directory runs (the
        reference's file bus is O(1 image), predict.py:160-178); per-scene
        outputs must be bit-identical to the all-at-once run (CPU f32
        convs are batch-shape-invariant, so ANY diff is a chunking bug)."""
        from building_detection_tpu.cli import predict as predict_cli
        from building_detection_tpu.core.config import Config

        import dataclasses

        cfg = dataclasses.replace(
            Config(),
            tiler=dataclasses.replace(
                Config().tiler, tile=32, stride=24, overlap=8
            ),
        )
        cfg_path = str(tmp_path / "cfg.json")
        cfg.to_json(cfg_path)

        scene_dir = tmp_path / "scenes"
        scene_dir.mkdir()
        rng = np.random.RandomState(7)
        for name in ["a", "b", "c"]:  # mixed shapes across chunk boundaries
            h, w = rng.choice([40, 48]), rng.choice([40, 56])
            uio.imwrite(
                str(scene_dir / f"{name}.png"),
                rng.randint(0, 256, (h, w, 3), np.uint8),
            )
        outs = {}
        for label, chunk in [("whole", "0"), ("chunked", "1")]:
            out_dir = str(tmp_path / f"out_{label}")
            rc = predict_cli.main([
                "--image-dir", str(scene_dir),
                "--out", out_dir,
                "--config", cfg_path,
                "--batch-tiles", "4",
                "--precision", "f32",
                "--chunk-scenes", chunk,
            ])
            assert rc == 0
            outs[label] = out_dir
        for name in ["a", "b", "c"]:
            m0 = uio.imread_gray(
                os.path.join(outs["whole"], name, f"{name}_result.png")
            )
            m1 = uio.imread_gray(
                os.path.join(outs["chunked"], name, f"{name}_result.png")
            )
            np.testing.assert_array_equal(m0, m1)
            with open(os.path.join(outs["whole"], name, f"{name}.txt")) as f:
                t0 = f.read()
            with open(os.path.join(outs["chunked"], name, f"{name}.txt")) as f:
                t1 = f.read()
            assert t0 == t1


class TestFleetPredictCli:
    def test_two_process_union_equals_single_process(self, tmp_path):
        """--num-processes/--process-id shard the sorted scene list with
        zero coordination; the UNION of all shards' outputs must be
        bit-identical to one single-process run (VERDICT r4 item 5:
        MIGRATION.md's fleet-inference guidance, executable).  The two
        shard invocations share no state (fresh Pipeline each), exactly
        like two separate host processes."""
        import dataclasses

        from building_detection_tpu.cli import predict as predict_cli
        from building_detection_tpu.core.config import Config

        cfg = dataclasses.replace(
            Config(),
            tiler=dataclasses.replace(
                Config().tiler, tile=32, stride=24, overlap=8
            ),
        )
        cfg_path = str(tmp_path / "cfg.json")
        cfg.to_json(cfg_path)

        scene_dir = tmp_path / "scenes"
        scene_dir.mkdir()
        rng = np.random.RandomState(3)
        names = ["a", "b", "c"]  # 3 scenes over 2 shards: uneven split
        for name in names:
            uio.imwrite(
                str(scene_dir / f"{name}.png"),
                rng.randint(0, 256, (48, 40, 3), np.uint8),
            )

        base = [
            "--image-dir", str(scene_dir),
            "--config", cfg_path,
            "--batch-tiles", "4",
            "--precision", "f32",
        ]
        single_out = str(tmp_path / "single")
        assert predict_cli.main(base + ["--out", single_out]) == 0

        fleet_out = str(tmp_path / "fleet")
        for pid in (0, 1):
            rc = predict_cli.main(base + [
                "--out", fleet_out,
                "--num-processes", "2",
                "--process-id", str(pid),
            ])
            assert rc == 0

        # union covers every scene exactly once, bit-identical outputs
        assert sorted(os.listdir(fleet_out)) == sorted(names)
        for name in names:
            m0 = uio.imread_gray(
                os.path.join(single_out, name, f"{name}_result.png")
            )
            m1 = uio.imread_gray(
                os.path.join(fleet_out, name, f"{name}_result.png")
            )
            np.testing.assert_array_equal(m0, m1)
            with open(os.path.join(single_out, name, f"{name}.txt")) as f:
                t0 = f.read()
            with open(os.path.join(fleet_out, name, f"{name}.txt")) as f:
                t1 = f.read()
            assert t0 == t1

    def test_shard_validation_and_empty_shard(self, tmp_path, capsys):
        from building_detection_tpu.cli import predict as predict_cli

        scene_dir = tmp_path / "scenes"
        scene_dir.mkdir()
        uio.imwrite(
            str(scene_dir / "a.png"),
            np.random.RandomState(0).randint(0, 256, (48, 40, 3), np.uint8),
        )
        base = ["--image-dir", str(scene_dir), "--out", str(tmp_path / "o")]
        # invalid shard index
        assert predict_cli.main(
            base + ["--num-processes", "2", "--process-id", "2"]
        ) == 2
        # a single --image cannot shard
        assert predict_cli.main([
            "--image", str(scene_dir / "a.png"), "--out", str(tmp_path / "o"),
            "--num-processes", "2", "--process-id", "0",
        ]) == 2
        # more processes than scenes: the empty shard is a clean no-op
        assert predict_cli.main(
            base + ["--num-processes", "2", "--process-id", "1"]
        ) == 0
        capsys.readouterr()


class TestAugmentCli:
    def test_offline_builder_and_split(self, tmp_path):
        """The reference's offline dataset builder + 9:1 split
        (`data_enhancement.py:100-232`)."""
        from building_detection_tpu.cli import augment as augment_cli

        img_dir, lab_dir = write_pairs(tmp_path, n=3, size=16, name="raw")
        out_i = str(tmp_path / "aug_images")
        out_l = str(tmp_path / "aug_labels")
        rc = augment_cli.main([
            "--images", img_dir,
            "--labels", lab_dir,
            "--out-images", out_i,
            "--out-labels", out_l,
            "--split-dir", str(tmp_path / "split"),
            "--seed", "0",
        ])
        assert rc == 0
        outs = os.listdir(out_i)
        assert len(outs) >= 3 and len(outs) == len(os.listdir(out_l))
        assert os.path.isdir(str(tmp_path / "split"))
