"""Generate the canonical Keras layer order for each zoo model.

``tf_keras``'s positional ``model.load_weights(h5)`` pairs the file's
``layer_names`` groups with ``model.layers`` BY POSITION
(`hdf5_format.load_weights_from_hdf5_group`), and ``model.layers`` for a
functional model is the graph's depth order — NOT instantiation order: in a
residual block Keras enumerates the main-path separable convs before the
shortcut conv even though the shortcut was instantiated first.  Our pytrees
are keyed in instantiation order, so exporting them verbatim produces an
``.h5`` the reference stack's positional load rejects ("Weight count
mismatch for layer #4...").

This script extracts the canonical (fresh-process name-counter) order once
per model by building the reference model under real tf_keras
(`/root/reference/predict_model/*.py`, verbatim), saving its weights file,
and reading back the weight-bearing ``layer_names`` subsequence — the exact
sequence the reference's ``model.load_weights`` (`predict.py:17-54`) will
pair positionally.  The result is checked in as
``building_detection_tpu/models/keras_layer_order.json`` (derived behavioral
contract data, same category as the param fingerprints in tests) and used by
``train/checkpoint.py::export_h5_weights(layer_order=...)``.

Keras name counters are process-global, so each model is extracted in a
fresh subprocess.

Usage: python scripts/gen_keras_layer_order.py            # all five, writes JSON
       python scripts/gen_keras_layer_order.py <model>    # one model, prints JSON
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODELS = ["res34", "scse", "v3plus", "bam", "hrnet"]
OUT = os.path.join(REPO, "building_detection_tpu", "models", "keras_layer_order.json")


def extract_one(name: str) -> list:
    import tempfile

    import h5py

    from tests import tf_oracle

    fd, h5 = tempfile.mkstemp(suffix=f"_{name}.h5")
    os.close(fd)
    tf_oracle.export_reference_weights(name, h5)
    with h5py.File(h5) as f:
        names = [
            n.decode() if isinstance(n, bytes) else n
            for n in f.attrs["layer_names"]
        ]
        order = [
            n for n in names if len(f[n].attrs.get("weight_names", []))
        ]
    os.unlink(h5)
    return order


def main():
    if len(sys.argv) > 1:
        print(json.dumps(extract_one(sys.argv[1])))
        return
    result = {}
    for name in MODELS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True,
            text=True,
            timeout=540,
            cwd=REPO,
        )
        if proc.returncode != 0:
            sys.exit(f"{name} extraction failed:\n{proc.stderr[-2000:]}")
        result[name] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"{name}: {len(result[name])} weight-bearing layers")
    with open(OUT, "w") as f:
        json.dump(result, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
