"""Full Pipeline integration (predict_image / predict_file) with tiny zoo
models patched into the registry — exercises tiler + fused ensemble + fusion
+ polygon extraction + file contract end to end on CPU."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from building_detection_tpu.core.config import Config, TilerConfig
from building_detection_tpu.infer.pipeline import Pipeline
from building_detection_tpu.models import registry
from building_detection_tpu.nn import layers as L
from building_detection_tpu.utils import io as uio

SMALL = Config(tiler=TilerConfig(tile=64, stride=48, overlap=16))


def tiny_fn(s, x):
    x = L.conv2d(s, x, 6, 3, strides=2, activation="relu")
    x = L.conv2d_transpose(s, x, 6, 2, strides=2, activation="relu")
    return L.conv2d(s, x, 2, 3, activation="softmax")


@pytest.fixture()
def tiny_registry(monkeypatch):
    for name in registry.ENSEMBLE_ORDER:
        monkeypatch.setitem(registry.MODEL_REGISTRY, name, tiny_fn)
    yield


class TestPipeline:
    def test_predict_image_end_to_end(self, tiny_registry):
        pipe = Pipeline(cfg=SMALL, batch_tiles=4, compute_dtype=jnp.float32)
        img = np.random.RandomState(0).randint(0, 256, (100, 150, 3), np.uint8)
        result = pipe.predict_image(img)
        assert set(result.masks) == set(registry.ENSEMBLE_ORDER)
        for m in result.masks.values():
            assert m.shape == (100, 150) and set(np.unique(m)) <= {0, 255}
        assert result.fused.shape == (100, 150)
        assert result.height == 100
        for xs, ys in result.corners:
            assert len(xs) == len(ys) >= 4  # closed rings
            assert xs[0] == xs[-1] and ys[0] == ys[-1]
        # stage timer populated
        summary = pipe.timer.summary()
        assert {"ensemble_forward", "fusion", "polygons"} <= set(summary)

    def test_fused_equals_unfused_pipeline(self, tiny_registry):
        img = np.random.RandomState(1).randint(0, 256, (80, 80, 3), np.uint8)
        fused = Pipeline(cfg=SMALL, batch_tiles=4, compute_dtype=jnp.float32, seed=7)
        unfused = Pipeline(
            cfg=SMALL, batch_tiles=4, compute_dtype=jnp.float32, seed=7, fused=False
        )
        a = fused.predict_image(img)
        b = unfused.predict_image(img)
        np.testing.assert_array_equal(a.fused, b.fused)
        for k in a.masks:
            np.testing.assert_array_equal(a.masks[k], b.masks[k])

    def test_predict_file_contract(self, tiny_registry, tmp_path):
        pipe = Pipeline(cfg=SMALL, batch_tiles=4, compute_dtype=jnp.float32)
        img = np.random.RandomState(2).randint(0, 256, (64, 64, 3), np.uint8)
        src = str(tmp_path / "scene_7.png")
        uio.imwrite(src, img)
        out_dir = str(tmp_path / "out")
        result = pipe.predict_file(src, out_dir, keep_intermediates=True)
        files = sorted(os.listdir(out_dir))
        # per-model masks + result + points (predict.py naming)
        for name in registry.ENSEMBLE_ORDER:
            assert f"{name}_scene_7.png" in files
        assert "scene_7_result.png" in files and "scene_7.txt" in files
        # result png round-trips the fused mask
        np.testing.assert_array_equal(
            uio.imread_gray(os.path.join(out_dir, "scene_7_result.png")),
            result.fused,
        )
        # points txt format: "x,y x,y ... " per ring
        with open(os.path.join(out_dir, "scene_7.txt")) as f:
            lines = [l for l in f.read().splitlines() if l]
        assert len(lines) == len(result.corners)
        for line in lines:
            for pair in line.strip().split(" "):
                x, y = pair.split(",")
                float(x), float(y)

    def test_weights_roundtrip_through_pipeline(self, tiny_registry, tmp_path):
        """Checkpoints written by the trainer load into the pipeline."""
        from building_detection_tpu.core import module as M
        from building_detection_tpu.train.checkpoint import save_variables

        params, state = M.init(tiny_fn, jax.random.key(99), jnp.zeros((1, 64, 64, 3)))
        path = str(tmp_path / "res34.npz")
        save_variables(path, params, state)
        pipe = Pipeline(
            weights={"res34": path}, cfg=SMALL, batch_tiles=4,
            compute_dtype=jnp.float32, seed=0,
        )
        ref = Pipeline(cfg=SMALL, batch_tiles=4, compute_dtype=jnp.float32, seed=0)
        img = np.random.RandomState(3).randint(0, 256, (64, 64, 3), np.uint8)
        a = pipe.predict_image(img).masks["res34"]
        # seed 0 + key 99 params differ from Pipeline's seed-0 init for res34
        b = ref.predict_image(img).masks["res34"]
        assert a.shape == b.shape


class TestDiscoverWeights:
    def test_reference_filenames_and_npz_priority(self, tmp_path):
        """The reference deployment's own filenames resolve
        (`predict.py:17-54`: resnet34/deep/hrnet/scse/bam.h5), and our
        .npz takes priority over an .h5 with the same model."""
        from building_detection_tpu.infer.pipeline import discover_weights

        for f in ["resnet34.h5", "deep.h5", "hrnet.h5", "scse.h5", "bam.h5"]:
            (tmp_path / f).write_bytes(b"")
        got = discover_weights(str(tmp_path))
        assert got == {
            "res34": str(tmp_path / "resnet34.h5"),
            "v3plus": str(tmp_path / "deep.h5"),
            "hrnet": str(tmp_path / "hrnet.h5"),
            "scse": str(tmp_path / "scse.h5"),
            "bam": str(tmp_path / "bam.h5"),
        }
        (tmp_path / "res34.npz").write_bytes(b"")
        got = discover_weights(str(tmp_path))
        assert got["res34"] == str(tmp_path / "res34.npz")

    def test_our_names_and_missing_models(self, tmp_path):
        from building_detection_tpu.infer.pipeline import discover_weights

        (tmp_path / "v3plus.h5").write_bytes(b"")
        got = discover_weights(str(tmp_path))
        assert got == {"v3plus": str(tmp_path / "v3plus.h5")}
