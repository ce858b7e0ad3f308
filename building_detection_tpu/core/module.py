"""Minimal functional module system (param tape).

The reference stack builds its networks with Keras layer objects
(`/root/reference/predict_model/res34.py:27-170` etc.).  On TPU we want pure
functions of explicit pytrees so that ``jax.jit`` / ``pjit`` can trace a model
once and XLA can fuse aggressively.  This module provides the smallest thing
that works:

* a model is a plain Python function ``fn(scope, x) -> y``;
* ``init(fn, rng, x)`` runs it once in *init* mode, creating every parameter
  and piece of state (BN moving statistics) it asks for;
* ``apply(fn, variables, x)`` runs it as a pure function of the pytree.

Parameter names follow Keras auto-naming (``conv2d``, ``conv2d_1``, ...), with
explicit names taking precedence, so the ``.h5`` weight importer
(:mod:`building_detection_tpu.train.h5_import`) can map reference checkpoints
onto our pytrees by construction order.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
PyTree = Any

INIT = "init"
APPLY = "apply"


@dataclasses.dataclass
class Variables:
    """Everything a model owns: trainable params and non-trainable state."""

    params: Dict[str, Array]
    state: Dict[str, Array]

    def tree_flatten(self):  # pragma: no cover - convenience
        return (self.params, self.state)


class Scope:
    """A recording/replaying tape of named parameters.

    One ``Scope`` is threaded through the whole model call.  In ``init`` mode
    each :meth:`param`/:meth:`get_state` call creates the array; in ``apply``
    mode it looks the array up.  Auto-naming counters are global per call,
    mirroring how Keras names layers within one freshly-built model.
    """

    def __init__(
        self,
        mode: str,
        params: Dict[str, Array],
        state: Dict[str, Array],
        rng: Optional[Array] = None,
        train: bool = False,
        dtype: jnp.dtype = jnp.float32,
        compute_dtype: Optional[jnp.dtype] = None,
        int8_pointwise: bool = False,
        int8_scales: Optional[Dict[str, Array]] = None,
        int8_amax: Optional[Dict[str, Array]] = None,
    ):
        assert mode in (INIT, APPLY)
        self.mode = mode
        self.params = params
        self.state = state
        self.new_state: Dict[str, Array] = {}
        self.rng = rng
        self.train = train
        self.dtype = dtype
        # dtype activations are computed in (bf16 on TPU for speed, f32 for
        # bit-parity testing).  Params are always stored in `dtype`.
        self.compute_dtype = compute_dtype or dtype
        # opt-in inference quantization: 1x1 convolutions and separable-conv
        # pointwise steps run as int8 x int8 -> int32 MXU matmuls (measured
        # 1.24-1.63x over bf16 on the Xception pointwise shapes; spatial
        # convs measured ~1.0x and stay bf16 — docs/ARCHITECTURE.md).
        # NOT bit-parity with the reference; never active in training.
        self.int8_pointwise = int8_pointwise
        # Static per-site activation scales from calibration
        # (``calibrate_int8``): {site name -> f32 scalar amax}.  With these,
        # the quantize is a pure elementwise op (no data-dependent reduce),
        # so XLA fuses it into the producing fusion and the bf16->int8
        # round-trip costs no extra HBM pass.  Without them each site falls
        # back to a dynamic per-tensor max (safe but ~2 extra HBM passes).
        self.int8_scales = int8_scales
        # When not None, each active int8 site records its observed
        # per-tensor amax here during the call (calibration collection).
        self.int8_amax = int8_amax
        self._counters: Dict[str, int] = {}

    # -- naming ----------------------------------------------------------
    def auto_name(self, kind: str, name: Optional[str]) -> str:
        if name is not None:
            return name
        n = self._counters.get(kind, 0)
        self._counters[kind] = n + 1
        return kind if n == 0 else f"{kind}_{n}"

    def next_rng(self) -> Array:
        if self.rng is None:
            raise ValueError("Scope has no RNG (init mode requires one).")
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # -- parameters ------------------------------------------------------
    def param(self, name: str, shape: Tuple[int, ...], init_fn) -> Array:
        if self.mode == INIT:
            if name in self.params:
                raise ValueError(f"duplicate parameter name: {name}")
            # Record the spec only; params are materialised after the
            # abstract trace (see `init`), so tracing a 512x512 model does
            # not execute any convolutions.
            self.params[name] = _ParamSpec(tuple(shape), init_fn)
            return jnp.zeros(shape, self.compute_dtype)
        value = self.params[name]
        if value.shape != tuple(shape):
            raise ValueError(
                f"param {name}: stored shape {value.shape} != requested {tuple(shape)}"
            )
        return value.astype(self.compute_dtype)

    # -- state (BN moving stats etc.) -------------------------------------
    def get_state(self, name: str, shape: Tuple[int, ...], init_fn) -> Array:
        if self.mode == INIT:
            if name not in self.state:
                self.state[name] = _ParamSpec(tuple(shape), init_fn)
            return jnp.zeros(shape, self.dtype)
        return self.state[name]

    def put_state(self, name: str, value: Array) -> None:
        value = value.astype(self.dtype)
        if self.mode == INIT:
            self.state[name] = value
        else:
            self.new_state[name] = value


@dataclasses.dataclass
class _ParamSpec:
    shape: Tuple[int, ...]
    init_fn: Any


def init(
    fn: Callable[..., Any],
    rng: Array,
    *args,
    dtype=jnp.float32,
    **kwargs,
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Build (params, state) by *abstractly* tracing ``fn`` on example inputs.

    The trace runs under ``jax.eval_shape`` so no actual compute happens even
    for full-resolution example inputs; parameters are then materialised from
    the recorded specs with per-name deterministic RNG.
    """
    scope = Scope(INIT, {}, {}, rng=None, train=False, dtype=dtype)

    def is_arraylike(v):
        import numpy as np

        return isinstance(v, (jax.Array, np.ndarray, jax.ShapeDtypeStruct))

    traced_idx = [i for i, a in enumerate(args) if is_arraylike(a)]
    traced = [args[i] for i in traced_idx]

    def trace(*t):
        full = list(args)
        for i, v in zip(traced_idx, t):
            full[i] = v
        fn(scope, *full, **kwargs)
        return 0

    jax.eval_shape(trace, *traced)

    # Materialise all params in one jitted program (one dispatch instead of
    # one per parameter, which matters on CPU test runs).
    def materialize(key):
        return {
            name: spec.init_fn(jax.random.fold_in(key, i), spec.shape, dtype)
            for i, (name, spec) in enumerate(scope.params.items())
        }

    params = jax.jit(materialize)(rng)
    # jit flattens dict outputs in sorted-key order; restore CONSTRUCTION
    # order (the tape's insertion order) — the Keras .h5 importer's
    # order-based fallback depends on it to disambiguate shape-identical
    # layers (e.g. the 16 Xception middle-flow blocks, v3plus.py:239-252).
    params = {name: params[name] for name in scope.params}
    state = {
        name: spec.init_fn(None, spec.shape, dtype)
        for name, spec in scope.state.items()
    }
    return params, state


def apply(
    fn: Callable[..., Any],
    params: Dict[str, Array],
    state: Dict[str, Array],
    *args,
    train: bool = False,
    rng: Optional[Array] = None,
    compute_dtype=None,
    int8_pointwise: bool = False,
    int8_scales: Optional[Dict[str, Array]] = None,
    int8_amax: Optional[Dict[str, Array]] = None,
    **kwargs,
):
    """Pure functional application: returns (outputs, new_state).

    ``new_state`` is ``state`` with any updates (BN moving stats) applied;
    when ``train=False`` it is ``state`` unchanged.
    """
    scope = Scope(
        APPLY,
        params,
        state,
        rng=rng,
        train=train,
        dtype=jnp.result_type(jax.tree_util.tree_leaves(params)[0])
        if params
        else jnp.float32,
        compute_dtype=compute_dtype,
        int8_pointwise=int8_pointwise,
        int8_scales=int8_scales,
        int8_amax=int8_amax,
    )
    out = fn(scope, *args, **kwargs)
    if scope.new_state:
        new_state = dict(state)
        new_state.update(scope.new_state)
    else:
        new_state = state
    return out, new_state


def calibrate_int8(
    fn: Callable[..., Any],
    params: Dict[str, Array],
    state: Dict[str, Array],
    batches,
    *,
    int8_pointwise=True,
    compute_dtype=None,
    **kwargs,
) -> Dict[str, float]:
    """Collect per-site activation ``amax`` for the int8 pointwise path.

    Runs ``fn`` over the calibration ``batches`` (an iterable of input
    arrays, already normalized exactly as inference normalizes them) with
    ``Scope.int8_amax`` recording enabled, and returns
    ``{site name -> max |activation| observed}`` — the dict to pass back as
    ``int8_scales`` for static-scale quantization.  ``int8_pointwise``
    should be the same flag value (bool or min-channel int) that inference
    will use, so the recorded sites match the active sites.

    With static scales the quantize is a pure elementwise op XLA fuses
    into the producing fusion; the dynamic fallback's data-dependent max
    costs ~2 extra HBM passes over the activations and measured slower
    than bf16 end-to-end (docs/ARCHITECTURE.md round 3).  The reference
    has no quantized path; this exists only behind the opt-in flag.
    """

    @jax.jit
    def observe(p, st, x):
        amax: Dict[str, Array] = {}
        apply(
            fn,
            p,
            st,
            x,
            int8_pointwise=int8_pointwise,
            int8_amax=amax,
            compute_dtype=compute_dtype,
            **kwargs,
        )
        return amax

    scales: Dict[str, float] = {}
    for x in batches:
        observed = observe(params, state, x)
        for site, v in observed.items():
            scales[site] = max(scales.get(site, 0.0), float(v))
    return scales


def param_count(params: Dict[str, Array]) -> int:
    """Number of trainable scalars (matches Keras "Trainable params")."""
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def state_count(state: Dict[str, Array]) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(state))
