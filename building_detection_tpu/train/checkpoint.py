"""Checkpointing: params + state (+ optimizer) as flat ``.npz`` archives,
with an importer for the reference's Keras ``.h5`` weight files.

The reference saves weights-only ``.h5`` every epoch with no optimizer state
or resume support (`/root/reference/train_model/res34.py:591-630`).  Here a
checkpoint carries params, BN state, optimizer state and step, so training
resumes exactly (SURVEY.md section 5 "Checkpoint / resume").
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SEP = "||"  # flat-key separator inside npz archives


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        flat[prefix + key] = np.asarray(leaf)
    return flat


def save_variables(
    path: str,
    params: Dict[str, np.ndarray],
    state: Dict[str, np.ndarray],
    opt_state: Any = None,
    step: int = 0,
    metadata: Optional[dict] = None,
) -> None:
    """Write a checkpoint; ``path`` should end in ``.npz``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {}
    for k, v in params.items():
        payload[f"params{SEP}{k}"] = np.asarray(v)
    for k, v in state.items():
        payload[f"state{SEP}{k}"] = np.asarray(v)
    if opt_state is not None:
        for k, v in _flatten(opt_state).items():
            payload[f"opt{SEP}{k}"] = v
    payload[f"meta{SEP}step"] = np.asarray(step)
    if metadata:
        payload[f"meta{SEP}json"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8
        )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic publish


def load_variables(
    path: str, opt_state_template: Any = None
) -> Tuple[dict, dict, Any, int, dict]:
    """Read (params, state, opt_state, step, metadata)."""
    with np.load(path) as z:
        params, state, opt_flat, step, meta = {}, {}, {}, 0, {}
        for key in z.files:
            kind, name = key.split(SEP, 1)
            if kind == "params":
                params[name] = z[key]
            elif kind == "state":
                state[name] = z[key]
            elif kind == "opt":
                opt_flat[name] = z[key]
            elif kind == "meta" and name == "step":
                step = int(z[key])
            elif kind == "meta" and name == "json":
                meta = json.loads(z[key].tobytes().decode())
    opt_state = None
    if opt_state_template is not None and opt_flat:
        flat_tpl = _flatten(opt_state_template)
        assert set(flat_tpl) == set(opt_flat), "optimizer structure mismatch"
        leaves, treedef = jax.tree_util.tree_flatten_with_path(opt_state_template)
        rebuilt = [opt_flat[jax.tree_util.keystr(p)] for p, _ in leaves]
        opt_state = jax.tree_util.tree_unflatten(treedef, rebuilt)
    return params, state, opt_state, step, meta


# ---------------------------------------------------------------------------
# Keras .h5 importer (weight parity with reference checkpoints)
# ---------------------------------------------------------------------------
_KERAS_TO_OURS = {
    "kernel:0": "kernel",
    "bias:0": "bias",
    "gamma:0": "gamma",
    "beta:0": "beta",
    "moving_mean:0": "moving_mean",
    "moving_variance:0": "moving_variance",
    "depthwise_kernel:0": "depthwise_kernel",
    "pointwise_kernel:0": "pointwise_kernel",
}


def import_h5_weights(
    h5_path: str, params: dict, state: dict
) -> Tuple[dict, dict]:
    """Map a Keras weights-only ``.h5`` onto our pytrees by ordered shape
    matching.

    The reference loads hand-picked epochs' ``.h5`` files
    (`/root/reference/predict.py:21-49`).  Keras stores per-layer weight
    lists under ``model_weights/<layer>/<layer>/<weight>:0``; our module
    system names parameters in construction order with the same Keras
    conventions, so matching by (order, shape) is well-defined.  Transposed
    convolutions keep TF's (kh, kw, out, in) layout, so arrays transfer
    without transposition.
    """
    import h5py  # gated: only needed for parity imports

    new_params = dict(params)
    new_state = dict(state)
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in root.attrs.get("layer_names", list(root.keys()))]
        h5_weights = []  # ordered (suffix, array)
        for lname in layer_names:
            g = root[lname]
            wnames = g.attrs.get("weight_names", [])
            for wn in wnames:
                wn = wn.decode() if isinstance(wn, bytes) else wn
                arr = np.asarray(g[wn])
                suffix = wn.rsplit("/", 1)[-1]
                h5_weights.append((_KERAS_TO_OURS.get(suffix, suffix), arr))

    ours = [(k, "params") for k in params] + [(k, "state") for k in state]

    def suffix_of(key):
        return key.rsplit("/", 1)[-1]

    # consume h5 weights in order, matching by suffix + shape
    queue = list(h5_weights)
    for key, kind in ours:
        want = suffix_of(key)
        target = params[key] if kind == "params" else state[key]
        for i, (suf, arr) in enumerate(queue):
            if suf == want and tuple(arr.shape) == tuple(np.shape(target)):
                if kind == "params":
                    new_params[key] = arr.astype(np.asarray(target).dtype)
                else:
                    new_state[key] = arr.astype(np.asarray(target).dtype)
                queue.pop(i)
                break
    return new_params, new_state
