"""Mesh + sharding helpers.

Axes convention (scaling-book style):
- ``data``: data parallelism (batch axis). The reference's DDP maps here.
- ``model``: tensor parallelism for the wide matmuls (Dense kernels sharded
  on the feature axis); used by the multi-chip dry-run and large configs.

Batches are sharded on ``data``; parameters are replicated over ``data`` and
(optionally) sharded over ``model`` by the param-sharding rules.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec) -> Dict[str, int]:
    """Parse the user-facing mesh request into axis sizes.

    Accepts the ``--mesh`` CLI string (``"data=2,model=2"``,
    ``"model=2,seq=2"``, ``"pipe=4"``) or a ``train_cfg.parallel`` YAML
    block (``{data: 2, model: 2}``). Unknown axes raise; missing axes
    default to 1 (``data`` defaults to None = fill remaining devices).
    This is the runner surface for the reference's distributed flags
    (reference runner.py:221) — every parallelism axis is selectable from
    a recipe config.
    """
    # 'micro' is not a mesh axis: it is the pipeline microbatch count
    # (n_micro = pipe * A gives an A-wide GPipe grad-accumulation window);
    # 0 = auto (one microbatch per stage). 'fsdp' is a 0/1 modifier on the
    # 'data' axis (ZeRO/FSDP: params + optimizer state sharded over 'data',
    # see fsdp_param_rules); 'fsdp_min_size' is the smallest leaf (elements)
    # the FSDP rules will shard.
    out: Dict[str, Any] = {"data": None, "model": 1, "seq": 1, "pipe": 1,
                           "micro": 0, "fsdp": 0, "fsdp_min_size": 1 << 16}
    if spec is None:
        return out
    if isinstance(spec, str):
        items = [kv for kv in spec.replace(" ", "").split(",") if kv]
        pairs = []
        for kv in items:
            k, _, v = kv.partition("=")
            assert v, f"--mesh entry '{kv}' must be axis=size"
            pairs.append((k, v))
    else:
        pairs = list(dict(spec).items())
    for k, v in pairs:
        assert k in out, (f"unknown mesh axis '{k}' "
                          f"(choose from {sorted(out)})")
        out[k] = int(v)
        assert out[k] >= (0 if k in ("micro", "fsdp", "fsdp_min_size")
                          else 1), f"mesh axis {k} must be >= 1"
    return out


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None,
              n_seq: int = 1, n_pipe: int = 1) -> Mesh:
    """Device mesh. Axes: ('data', 'model') by default; ``n_seq > 1``
    inserts a 'seq' axis (sequence parallelism: time-axis activation
    sharding in :func:`train_step_gspmd`) and ``n_pipe > 1`` inserts a
    'pipe' axis (pipeline parallelism, parallel/pipeline.py). Full order:
    ('data', 'pipe', 'seq', 'model') with the optional axes present only
    when requested."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq * n_pipe)
    sizes = [("data", n_data), ("pipe", n_pipe), ("seq", n_seq),
             ("model", n_model)]
    need = n_data * n_model * n_seq * n_pipe
    assert need <= len(devices), \
        f"need {need} devices, have {len(devices)}"
    # optional axes ('pipe', 'seq') appear only when requested; 'data' and
    # 'model' are always present (backward-compat mesh shapes)
    axes = [(name, n) for name, n in sizes
            if n > 1 or name in ("data", "model")]
    dev_array = np.asarray(devices[:need]).reshape(
        *[n for _, n in axes])
    return Mesh(dev_array, tuple(name for name, _ in axes))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place array leaves of a host batch onto the mesh, sharded on batch
    dim 0 over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(
                mesh, P(*(("data",) + (None,) * (x.ndim - 1)))))
        return x

    return {k: put(v) if not isinstance(v, (list, str, int)) else v
            for k, v in batch.items()}


def hint_activation_sharding(x, *axis_names):
    """Best-effort GSPMD activation hint: pin dim ``i`` of ``x`` to mesh
    axis ``axis_names[i]`` (None = replicated) when the ambient mesh (set
    via ``jax.set_mesh`` by :func:`train_step_gspmd`) carries that axis as
    an Auto axis whose size divides the dim. No-op everywhere else: eager,
    plain jit without an ambient mesh, and shard_map bodies (their axes are
    Manual, never Auto).

    Why this exists: XLA's SPMD partitioner propagates PARAM shardings
    (tensor-parallel or FSDP seeds) onto attention activations, and the
    head split/merge reshape+transpose then faces a sharding transition it
    can only solve by full rematerialization — the "Involuntary full
    rematerialization" spmd_partitioner warning seen on the decoder
    cross-attention under FSDP meshes (MULTICHIP_r03). An explicit
    batch/head constraint on the split tensors removes the ambiguity
    (scaling-book recipe: annotate intermediates, don't hand-schedule).
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not getattr(mesh, "axis_names", ()):
        return x
    auto = jax.sharding.AxisType.Auto
    types = dict(zip(mesh.axis_names, mesh.axis_types))
    spec, used = [], False
    for dim, name in enumerate(axis_names):
        ok = (name is not None and name in types
              and types[name] == auto and mesh.shape[name] > 1
              and x.shape[dim] % mesh.shape[name] == 0)
        spec.append(name if ok else None)
        used = used or ok
    if not used:
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def param_sharding_rules(path: Tuple, leaf) -> P:
    """Default tensor-parallel rules: shard the widest axis of big Dense /
    Embed kernels over 'model'; everything else replicated.

    Kept deliberately simple — XLA's SPMD partitioner propagates from these
    seeds. Biases/LayerNorm scales stay replicated.
    """
    names = [str(p) for p in path]
    if any("expert" in n for n in names) and getattr(leaf, "ndim", 0) >= 2:
        # MoE expert tensors (E, ...): expert parallelism — shard the
        # expert axis over 'model'; dispatch/combine einsums become the
        # partitioner's all-to-all-style collectives (nn/moe.py)
        return P(*(("model",) + (None,) * (leaf.ndim - 1)))
    if getattr(leaf, "ndim", 0) >= 2 and leaf.size >= 1 << 16:
        if any("embed" in n or "kernel" in n for n in names):
            spec = [None] * leaf.ndim
            spec[-1] = "model"
            return P(*spec)
    return P()


def fsdp_param_rules(path: Tuple, leaf, n_data: int,
                     min_size: int = 1 << 16) -> P:
    """FSDP / ZeRO sharding rules: on top of the tensor-parallel rules,
    shard the largest still-unsharded axis of every big leaf over 'data'.

    The scaling-book FSDP recipe: parameters (and, through
    :func:`shard_state`, the optimizer moments) live sharded along the
    batch axis; XLA's partitioner inserts the per-layer all-gathers in the
    forward/backward and turns the gradient all-reduce into a
    reduce-scatter. Per-device at-rest bytes for params + Adam moments drop
    by ~n_data. Leaves smaller than ``min_size`` elements or with no axis
    divisible by ``n_data`` stay on the base rule (replicated over 'data').
    """
    base = param_sharding_rules(path, leaf)
    ndim = getattr(leaf, "ndim", 0)
    if ndim < 1 or leaf.size < min_size:
        return base
    spec = list(base) + [None] * (ndim - len(base))
    cands = [(leaf.shape[d], d) for d in range(ndim)
             if spec[d] is None and leaf.shape[d] % n_data == 0]
    if not cands:
        return base
    spec[max(cands)[1]] = "data"
    return P(*spec)


def make_param_rules(mesh: Mesh, fsdp: bool = False,
                     fsdp_min_size: int = 1 << 16) -> Callable:
    """The (path, leaf) -> PartitionSpec rule set for a mesh request:
    tensor-parallel seeds by default, plus FSDP 'data'-axis sharding when
    requested."""
    if not fsdp:
        return param_sharding_rules
    n_data = int(mesh.shape.get("data", 1))
    if n_data <= 1:
        return param_sharding_rules
    return partial(fsdp_param_rules, n_data=n_data, min_size=fsdp_min_size)


def shard_params(params, mesh: Mesh, rules: Optional[Callable] = None):
    """Apply :func:`param_sharding_rules` (or ``rules``) over a param
    pytree."""
    rules = rules or param_sharding_rules
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, rules(path, leaf)))

    leaves = [place(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def shard_state(state, mesh: Mesh, rules: Optional[Callable] = None):
    """Place a TrainState at rest on the mesh under the given rules.

    Params AND optimizer state are placed: optax state pytrees embed the
    param tree (mu/nu/accumulated grads keep the param names in their
    paths), so the same (path, leaf) rules shard the Adam moments exactly
    like their parameters — ZeRO-1/3 at rest when ``rules`` came from
    ``make_param_rules(fsdp=True)`` (requires the per-leaf optimizer form,
    ``build_optimizer(flatten=False)``; the flat fast path concatenates all
    moments into one buffer whose length is not mesh-divisible). Scalars
    and the mutables collections replicate.
    """
    rules = rules or param_sharding_rules

    def place_tree(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        leaves = [jax.device_put(l, NamedSharding(mesh, rules(p, l)))
                  for p, l in flat]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), leaves)

    rep = NamedSharding(mesh, P())
    return state._replace(
        step=jax.device_put(state.step, rep),
        params=place_tree(state.params),
        opt_state=place_tree(state.opt_state),
        mutables=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.mutables))


def train_step_gspmd(step_fn: Callable, mesh: Mesh,
                     donate_state: bool = True,
                     rules: Optional[Callable] = None) -> Callable:
    """GSPMD path: jit the GLOBAL-batch step with sharding annotations and
    let XLA insert the collectives (the scaling-book recipe). Supports
    dp x tp meshes: batch sharded on 'data', large kernels sharded on
    'model' via :func:`param_sharding_rules`; gradient reduction, batch-stat
    sync and metric averaging all fall out of the partitioner.

    ``step_fn`` must be written WITHOUT axis_name collectives
    (axis_name=None): the batch it sees is the global batch.

    If the mesh has a 'seq' axis (``make_mesh(n_seq=...)``), the TIME axis
    (dim 1) of rank>=2 batch arrays is additionally sharded over it —
    sequence parallelism: frame-local work (frontend, FFN, LayerNorm,
    prenet convs) partitions along time and the partitioner inserts the
    collectives attention needs (K/V all-gather / resharding). Useful when
    a single utterance's activations dominate memory (long audio).

    ``rules`` overrides the param-sharding seeds (e.g.
    ``make_param_rules(mesh, fsdp=True)`` for the FSDP/ZeRO path).

    The returned callable traces under ``jax.set_mesh(mesh)`` so
    model-internal :func:`hint_activation_sharding` calls see the ambient
    mesh and can pin the attention head split/merge layouts.
    """
    jitted = jax.jit(_gspmd_wrap(step_fn, mesh, rules),
                     donate_argnums=(0,) if donate_state else ())

    def run(state, batch, rng):
        with jax.set_mesh(mesh):
            return jitted(state, batch, rng)

    # the underlying jit object, for AOT/inspection (.lower(), cache
    # stats); call it under `jax.set_mesh(mesh)` yourself if you bypass
    # `run`
    run.jitted = jitted
    return run


def _gspmd_wrap(step_fn: Callable, mesh: Mesh,
                rules: Optional[Callable] = None) -> Callable:
    """The (unjitted) GSPMD constraint wrapper behind
    :func:`train_step_gspmd`; also reused by the scanned multi-batch form
    below. ``batch`` may be a flat dict of arrays or a multi-domain dict of
    such dicts ({'real': {...}, 'syn': {...}})."""
    seq = "seq" if "seq" in mesh.axis_names else None
    rules = rules or param_sharding_rules

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            spec = ["data"] + [None] * (x.ndim - 1)
            if seq is not None and x.ndim >= 2:
                spec[1] = seq
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    def constrain(b):
        if all(isinstance(v, dict) for v in b.values()) and b:
            return {name: constrain(sub) for name, sub in b.items()}
        return {k: (jax.lax.with_sharding_constraint(v, place(v))
                    if hasattr(v, "ndim") else v)
                for k, v in b.items()}

    def constrain_params(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, l: jax.lax.with_sharding_constraint(
                l, NamedSharding(mesh, rules(p, l))), params)

    def wrapped(state, batch, rng):
        batch = constrain(batch)
        state = state._replace(params=constrain_params(state.params))
        new_state, metrics = step_fn(state, batch, rng)
        # pin the at-rest layout of the NEW params too, so the updated
        # state keeps the requested sharding between steps (the optimizer
        # moments follow by propagation from their sharded inputs)
        return new_state._replace(
            params=constrain_params(new_state.params)), metrics

    return wrapped


def multi_batch_step_gspmd(step_fn: Callable, mesh: Mesh,
                           donate_state: bool = True,
                           rules: Optional[Callable] = None) -> Callable:
    """GSPMD form of :func:`multi_batch_step_under_mesh`: scan K stacked
    distinct batches through the constraint-wrapped global step in one
    executable (the ``--steps_per_dispatch`` path on dp x tp / seq
    meshes)."""
    wrapped = _gspmd_wrap(step_fn, mesh, rules)

    def scanned(state, stacked, rng):
        def one(carry, batch):
            return wrapped(carry, batch, rng)
        return jax.lax.scan(one, state, stacked)

    jitted = jax.jit(scanned, donate_argnums=(0,) if donate_state else ())

    def run(state, stacked, rng):
        with jax.set_mesh(mesh):
            return jitted(state, stacked, rng)

    run.jitted = jitted   # AOT/inspection access, as in train_step_gspmd
    return run


def train_step_under_mesh(step_fn: Callable, mesh: Mesh,
                          donate_state: bool = True) -> Callable:
    """Wrap a per-replica ``step_fn(state, batch, rng) -> (state, metrics)``
    with shard_map over the mesh: batch split on 'data', state replicated,
    collectives (psum/pmean with axis_name='data') resolved on ICI.
    """
    def run(state, batch, rng):
        # per-leaf batch specs: arrays shard on dim 0, scalars replicate
        batch_specs = jax.tree_util.tree_map(
            lambda x: P("data") if getattr(x, "ndim", 0) >= 1 else P(),
            batch)
        wrapped = jax.shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return wrapped(state, batch, rng)

    return jax.jit(run, donate_argnums=(0,) if donate_state else ())


def multi_batch_step_under_mesh(step_fn: Callable, mesh: Mesh,
                                donate_state: bool = True) -> Callable:
    """Device-resident loop over K DISTINCT batches in one executable.

    ``f(state, stacked_batch, rng) -> (state, metrics)`` where every array
    leaf of ``stacked_batch`` carries a leading K axis (K host batches
    stacked with ``np.stack``); the scan consumes one batch per step.
    ``metrics`` leaves come back stacked ``(K, ...)`` so the monitor can
    log each step. The rng passes through unchanged: every step factory
    folds it with ``state.step`` internally (train/state.py), so the scan
    is EXACTLY equivalent to K sequential ``train_step_under_mesh`` calls
    with the same rng. This is the production form of
    :func:`multi_step_under_mesh` (which re-uses one batch and exists for
    benchmarking): per-dispatch host/link latency is paid once per K real
    optimizer updates.
    """
    def scanned(state, stacked, rng):
        def one(carry, batch):
            return step_fn(carry, batch, rng)
        return jax.lax.scan(one, state, stacked)

    def run(state, stacked, rng):
        batch_specs = jax.tree_util.tree_map(
            lambda x: P(None, "data") if getattr(x, "ndim", 0) >= 2
            else P(), stacked)
        wrapped = jax.shard_map(
            scanned, mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return wrapped(state, stacked, rng)

    return jax.jit(run, donate_argnums=(0,) if donate_state else ())


def multi_step_under_mesh(step_fn: Callable, mesh: Mesh, n_steps: int,
                          donate_state: bool = True) -> Callable:
    """Run ``n_steps`` train steps in ONE compiled executable:
    ``lax.scan`` over the step inside the shard_map. Each scanned step
    re-uses the same host batch with a distinct fold_in'd rng.

    This is the device-resident training-loop pattern: a single dispatch
    executes K optimizer updates, so per-call host/link latency is paid
    once per K steps instead of once per step. Used by bench.py for
    dispatch-latency-proof throughput measurement; production loops on
    remote-attached hosts can use it whenever per-step host work (monitor
    hooks, fresh data) is not needed every step.

    Returns ``f(state, batch, rng) -> (state, losses[n_steps])``; the loss
    chain makes execution observable — copying ``losses`` to host forces
    every scanned step to have really run.
    """
    def scanned(state, batch, rng):
        def one(carry, i):
            new_state, metrics = step_fn(carry, batch,
                                         jax.random.fold_in(rng, i))
            return new_state, metrics["loss"]
        return jax.lax.scan(one, state,
                            jnp.arange(n_steps, dtype=jnp.int32))

    def run(state, batch, rng):
        batch_specs = jax.tree_util.tree_map(
            lambda x: P("data") if getattr(x, "ndim", 0) >= 1 else P(),
            batch)
        wrapped = jax.shard_map(
            scanned, mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return wrapped(state, batch, rng)

    return jax.jit(run, donate_argnums=(0,) if donate_state else ())
