"""Checkpointing: params + state (+ optimizer) as flat ``.npz`` archives,
with an importer for the reference's Keras ``.h5`` weight files.

The reference saves weights-only ``.h5`` every epoch with no optimizer state
or resume support (`/root/reference/train_model/res34.py:591-630`).  Here a
checkpoint carries params, BN state, optimizer state and step, so training
resumes exactly (SURVEY.md section 5 "Checkpoint / resume").
"""
from __future__ import annotations

import dataclasses
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


def check_matches_model(
    path: str, loaded_params: dict, loaded_state: dict,
    template_params: dict, template_state: dict, model_name: str,
) -> None:
    """Loud structural check of loaded variables against a model's template:
    key sets and per-key shapes must match exactly, so a wrong-model ``.npz``
    fails here instead of half-applying (trainer) or producing an unloadable
    ``.h5`` (bdt-convert).  Raises ``ValueError`` naming the first mismatch."""
    for kind, theirs, ours in (
        ("params", loaded_params, template_params),
        ("state", loaded_state, template_state),
    ):
        if set(theirs) != set(ours):
            missing = sorted(set(ours) - set(theirs))[:3]
            extra = sorted(set(theirs) - set(ours))[:3]
            raise ValueError(
                f"{path} does not match model {model_name!r} "
                f"({kind} keys differ; missing e.g. {missing}, "
                f"unexpected e.g. {extra})"
            )
        for k in ours:
            if tuple(np.shape(theirs[k])) != tuple(np.shape(ours[k])):
                raise ValueError(
                    f"{path}: {kind}[{k!r}] shape "
                    f"{tuple(np.shape(theirs[k]))} != model's "
                    f"{tuple(np.shape(ours[k]))}"
                )


# ---------------------------------------------------------------------------
# Keras .h5 import/export (weight parity with reference checkpoints)
# ---------------------------------------------------------------------------
_STATE_SUFFIXES = ("moving_mean", "moving_variance")


def _decode(n):
    return n.decode() if isinstance(n, bytes) else n


@dataclasses.dataclass
class H5ImportReport:
    """What an .h5 import actually did — a half-loaded parity checkpoint
    silently producing garbage masks is worse than a loud failure."""

    matched_by_name: int = 0
    matched_by_order: int = 0
    unmatched_ours: list = dataclasses.field(default_factory=list)
    leftover_h5: list = dataclasses.field(default_factory=list)
    # why the all-or-nothing name pass was abandoned (diagnostic only — the
    # ordered pass may still resolve the file completely, so this does NOT
    # gate `complete`; it explains surprising matched_by_order imports)
    name_pass_rejected: str = ""

    @property
    def complete(self) -> bool:
        return not (self.unmatched_ours or self.leftover_h5)

    def summary(self) -> str:
        lines = [
            f"h5 import: {self.matched_by_name} matched by name, "
            f"{self.matched_by_order} by order"
        ]
        if self.name_pass_rejected:
            lines.append(f"  name pass rejected: {self.name_pass_rejected}")
        if self.unmatched_ours:
            lines.append(
                f"  UNMATCHED TARGET PARAMS ({len(self.unmatched_ours)}, left at "
                "previous values): " + ", ".join(self.unmatched_ours[:10])
                + ("..." if len(self.unmatched_ours) > 10 else "")
            )
        if self.leftover_h5:
            lines.append(
                f"  LEFTOVER H5 WEIGHTS ({len(self.leftover_h5)}, dropped): "
                + ", ".join(self.leftover_h5[:10])
                + ("..." if len(self.leftover_h5) > 10 else "")
            )
        return "\n".join(lines)


def _read_h5_entries(h5_path: str):
    """Ordered ``(layer_name, suffix, full_name, array)`` from a Keras
    weights file.  Layer order comes from the ``layer_names`` attribute
    (Keras writes it in model.layers order); weight order within a layer
    from ``weight_names`` (trainable then non-trainable)."""
    import h5py  # gated: only needed for parity imports

    entries = []
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            _decode(n) for n in root.attrs.get("layer_names", list(root.keys()))
        ]
        for lname in layer_names:
            g = root[lname]
            for wn in g.attrs.get("weight_names", []):
                wn = _decode(wn)
                arr = np.asarray(g[wn])
                suffix = wn.rsplit("/", 1)[-1].split(":")[0]
                if suffix == "depthwise_kernel" and arr.ndim == 4:
                    # Keras (kh, kw, in_ch, mult=1) -> ours (kh, kw, 1, in_ch)
                    arr = np.ascontiguousarray(arr.transpose(0, 1, 3, 2))
                # Keras prefixes weight paths with the layer scope; the
                # layer name in the path is authoritative for name matching
                layer = wn.rsplit("/", 2)[-2] if "/" in wn else lname
                entries.append((layer, suffix, f"{lname}/{wn}", arr))
    return entries


def import_h5_weights(
    h5_path: str, params: dict, state: dict, strict: bool = True
) -> Tuple[dict, dict, H5ImportReport]:
    """Map a Keras weights-only ``.h5`` onto our pytrees.

    The reference's entire deployment story is loading hand-picked epochs'
    ``.h5`` files (`/root/reference/predict.py:17-54`).  Matching runs in two
    passes:

    1. **by name, all-or-nothing** — our module system reproduces Keras
       auto-naming (``conv2d_5/kernel`` ↔ ``conv2d_5/kernel:0``), so
       checkpoints written with fresh per-model name counters (the reference
       trains one model per process, `train_model/*.py`) match exactly.
       Accepted only if names cover every target and consume every h5
       weight with agreeing shapes — partial name matches are rejected
       because offset-counter files contain colliding names for different
       layers;
    2. **by order** — otherwise everything matches by (suffix, shape) in
       stored order against our *construction* order, which is how Keras'
       ``load_weights`` itself resolves an .h5 (topological order, names not
       required).  This disambiguates shape-identical stacks like the 16
       Xception middle-flow blocks (`v3plus.py:239-252`).

    Transposed convolutions keep TF's (kh, kw, out, in) layout, so arrays
    transfer without transposition.  Depthwise kernels do NOT: Keras'
    ``SeparableConv2D`` stores ``depthwise_kernel`` as ``(kh, kw, in_ch, 1)``
    (depth_multiplier last — used throughout the Xception backbones,
    `/root/reference/predict_model/v3plus.py:185-280`) while ours is the XLA
    grouped-conv layout ``(kh, kw, 1, in_ch)`` (`nn/layers.py:113`); the last
    two axes are swapped on the way in (and back on export), which is exact
    because one of them has size 1.

    ``strict=True`` (default) raises unless every target parameter was
    assigned and every h5 weight consumed; ``strict=False`` leaves unmatched
    targets at their previous values and returns the report for inspection.
    """
    entries = _read_h5_entries(h5_path)
    new_params = dict(params)
    new_state = dict(state)
    report = H5ImportReport()

    ours = [(k, "params") for k in params] + [(k, "state") for k in state]
    targets = {**{k: params[k] for k in params}, **{k: state[k] for k in state}}

    def assign(key, kind, arr):
        target = targets[key]
        if kind == "params":
            new_params[key] = arr.astype(np.asarray(target).dtype)
        else:
            new_state[key] = arr.astype(np.asarray(target).dtype)

    # pass 1: exact name matching — ALL-OR-NOTHING.  An .h5 written with
    # OFFSET name counters (Keras counters are process-global, so any model
    # built after another in one process gets conv2d_107...) can contain
    # names that collide with a fresh model's names while denoting entirely
    # different layers; accepting partial name matches would assign wrong
    # weights silently (caught by the cross-model e2e parity run).  Name
    # matching is trusted only when it covers every target AND consumes
    # every h5 weight with agreeing shapes; otherwise the whole file
    # resolves by construction-ordered (suffix, shape) matching — the same
    # topological resolution Keras' own ``load_weights`` uses.
    by_name = {}
    for idx, (layer, suffix, full, arr) in enumerate(entries):
        by_name.setdefault(f"{layer}/{suffix}", idx)
    name_assign = {}
    name_used = set()
    names_complete = len(entries) == len(ours)
    if not names_complete:
        report.name_pass_rejected = (
            f"h5 holds {len(entries)} weights, model has {len(ours)}"
        )
    for key, kind in ours:
        if not names_complete:
            break
        idx = by_name.get(key)
        if idx is None:
            report.name_pass_rejected = f"{key} absent from h5 names"
        elif idx in name_used:
            report.name_pass_rejected = f"{entries[idx][2]} claimed twice"
        elif tuple(entries[idx][3].shape) != tuple(np.shape(targets[key])):
            report.name_pass_rejected = (
                f"{key}: ours {tuple(np.shape(targets[key]))} != "
                f"h5 {tuple(entries[idx][3].shape)}"
            )
        else:
            name_assign[key] = idx
            name_used.add(idx)
            continue
        names_complete = False

    consumed = set()
    if names_complete:
        for key, kind in ours:
            assign(key, kind, entries[name_assign[key]][3])
            consumed.add(name_assign[key])
        report.matched_by_name = len(ours)
    else:
        # pass 2: ordered (suffix, shape) matching for everything
        for key, kind in ours:
            want = key.rsplit("/", 1)[-1]
            shape = tuple(np.shape(targets[key]))
            for idx, (layer, suffix, full, arr) in enumerate(entries):
                if idx in consumed:
                    continue
                if suffix == want and tuple(arr.shape) == shape:
                    assign(key, kind, arr)
                    consumed.add(idx)
                    report.matched_by_order += 1
                    break
            else:
                report.unmatched_ours.append(key)

    report.leftover_h5 = [
        full for idx, (_, _, full, _) in enumerate(entries) if idx not in consumed
    ]
    if strict and not report.complete:
        raise ValueError(f"strict .h5 import failed for {h5_path}:\n{report.summary()}")
    return new_params, new_state, report


def export_h5_weights(
    path: str, params: dict, state: dict, layer_order=None
) -> None:
    """Write our pytrees as a Keras-layout weights-only ``.h5``.

    Reproduces what ``model.save_weights`` emits for the reference models
    (the format `predict.py:17-54` consumes): root attr ``layer_names``;
    per-layer group with a ``weight_names`` attribute listing
    ``<layer>/<weight>:0`` paths, trainable weights first then non-trainable
    (BN moving statistics).

    ``layer_order`` controls the group order.  Keras' positional
    ``model.load_weights`` pairs file groups with ``model.layers`` BY
    POSITION, and ``model.layers`` is graph depth order — NOT our pytrees'
    instantiation order (residual shortcuts enumerate after their main
    path).  Pass :func:`models.registry.keras_layer_order` for a zoo model
    to produce a file the UNMODIFIED reference stack loads verbatim (proven
    against real tf_keras in tests/test_tf_oracle.py).  Without it the file
    keeps instantiation order — our own importer accepts either (name pass),
    but Keras' positional load may not.
    """
    import h5py

    def layer_of(key):
        return key.rsplit("/", 1)[0]

    # Keras' per-layer weight order is layer.weights = trainable then
    # non-trainable, in the layer's own build order — NOT dict order.  A
    # checkpoint that round-tripped through npz (np.savez sorts keys) would
    # otherwise emit bias before kernel and Keras' POSITIONAL pairing inside
    # each group would load the bias array into the kernel slot (caught live
    # by scripts/train_deploy_demo.py; pinned in tests/test_checkpoint.py).
    _KERAS_WEIGHT_RANK = {
        "kernel": 0,
        "depthwise_kernel": 0,
        "pointwise_kernel": 1,
        "gamma": 0,
        "beta": 1,
        "bias": 2,
        "moving_mean": 3,
        "moving_variance": 4,
    }

    def weight_rank(key):
        return _KERAS_WEIGHT_RANK[key.rsplit("/", 1)[1]]

    # default layer order = first appearance in construction-ordered params,
    # then any state-only layers in state order
    layer_weights: Dict[str, list] = {}
    for key, arr in params.items():
        layer_weights.setdefault(layer_of(key), []).append((key, arr))
    for key, arr in state.items():
        layer_weights.setdefault(layer_of(key), []).append((key, arr))
    for weights in layer_weights.values():
        weights.sort(key=lambda kv: weight_rank(kv[0]))
    if layer_order is not None:
        ours, want = set(layer_weights), set(layer_order)
        if ours != want:
            missing = sorted(want - ours)[:5]
            extra = sorted(ours - want)[:5]
            raise ValueError(
                "layer_order does not match the checkpoint's layers "
                f"(missing from checkpoint: {missing}, "
                f"not in layer_order: {extra})"
            )
        layer_weights = {ln: layer_weights[ln] for ln in layer_order}

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [ln.encode() for ln in layer_weights]
        f.attrs["backend"] = b"tensorflow"
        # without a keras_version attr, tf_keras' loader routes the file
        # through preprocess_weights_for_loading's KERAS-1 legacy path,
        # which transposes Conv2DTranspose kernels (caught by the reverse
        # probe in tests/test_tf_oracle.py); any 2.x value avoids it
        f.attrs["keras_version"] = b"2.21.0"
        for lname, weights in layer_weights.items():
            g = f.create_group(lname)
            wnames = []
            for key, arr in weights:
                wn = f"{key}:0"  # "<layer>/<weight>:0"
                wnames.append(wn.encode())
                arr = np.asarray(arr)
                if key.endswith("/depthwise_kernel") and arr.ndim == 4:
                    # ours (kh, kw, 1, in_ch) -> Keras (kh, kw, in_ch, 1)
                    arr = np.ascontiguousarray(arr.transpose(0, 1, 3, 2))
                g.create_dataset(wn, data=arr)
            g.attrs["weight_names"] = wnames
