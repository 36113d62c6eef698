"""Optimizer + LR-scheduler fusion (optax).

Rebuild of reference ``speechain/optim_sche/*``:
- Noam warmup/decay (optim_sche/noam.py): lr(step) = init_lr *
  min(step^-0.5, step * warmup^-1.5), with init_lr = d_model^-0.5 if d_model
  given else peak_lr * warmup^0.5 (so lr peaks at peak_lr after warmup).
- per-epoch exponential decay (optim_sche/exp.py): lr = base * factor^(ep-1);
  expressed per-step via steps_per_epoch.
- the OptimScheduler features (optim_sche/abs.py:19-339): grad accumulation
  -> ``optax.MultiSteps``; grad clipping -> ``clip_by_global_norm``;
  finite-check skip -> ``optax.apply_if_finite``; ``ft_factor`` scales the
  schedule; multi-optimizer / ``updated_modules`` partial updates ->
  ``optax.multi_transform`` with path-prefix labeling.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import optax


def noam_schedule(peak_lr: float = 2e-3, warmup_steps: int = 4000,
                  d_model: Optional[int] = None,
                  ft_factor: float = 1.0) -> optax.Schedule:
    init_lr = (d_model ** -0.5 if d_model is not None
               else peak_lr * warmup_steps ** 0.5)

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype")
                        else jnp.asarray(step, jnp.float32), 1.0)
        return ft_factor * init_lr * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)

    return schedule


def exp_decay_schedule(base_lr: float, decay_factor: float = 0.999,
                       steps_per_epoch: int = 1000,
                       ft_factor: float = 1.0) -> optax.Schedule:
    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        return ft_factor * base_lr * decay_factor ** epoch

    return schedule


OPTIMIZERS = {
    "Adam": lambda lr, conf: optax.adam(
        lr, b1=conf.get("betas", (0.9, 0.999))[0],
        b2=conf.get("betas", (0.9, 0.999))[1],
        eps=conf.get("eps", 1e-8)),
    "AdamW": lambda lr, conf: optax.adamw(
        lr, b1=conf.get("betas", (0.9, 0.999))[0],
        b2=conf.get("betas", (0.9, 0.999))[1],
        eps=conf.get("eps", 1e-8),
        weight_decay=conf.get("weight_decay", 1e-2)),
    "SGD": lambda lr, conf: optax.sgd(
        lr, momentum=conf.get("momentum", 0.0)),
}


def _safe_clip_update(inner: optax.GradientTransformation,
                      grad_clip: Optional[float]
                      ) -> optax.GradientTransformation:
    """Global-norm clip + nonfinite-step skip in one pass.

    Drop-in replacement for ``clip_by_global_norm`` + ``apply_if_finite``
    (the reference's grad-inf skip, optim_sche/abs.py:238-247) designed for
    the ``optax.flatten`` domain: the global norm is ONE reduction over the
    flat gradient buffer, its finiteness decides the skip (any NaN/inf leaf
    makes the norm nonfinite), and on skip the inner optimizer state and
    params stay exactly untouched — same semantics, none of the ~600
    per-leaf reduce/isfinite ops.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        return dict(inner=inner.init(params),
                    notfinite=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)))
        finite = jnp.isfinite(gnorm)
        clip_scale = (jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
                      if grad_clip is not None else 1.0)
        scale = jnp.where(finite, clip_scale, 0.0)
        g2 = jax.tree_util.tree_map(
            lambda g: g * scale.astype(g.dtype), grads)
        updates, new_inner = inner.update(g2, state["inner"], params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        new_inner = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o) if hasattr(n, "dtype")
            else n, new_inner, state["inner"])
        return updates, dict(
            inner=new_inner,
            notfinite=state["notfinite"] + jnp.where(finite, 0, 1))

    return optax.GradientTransformation(init, update)


def build_optimizer(sche_type: str = "noam", optim_type: str = "Adam",
                    optim_conf: Optional[Dict[str, Any]] = None,
                    warmup_steps: int = 4000, d_model: Optional[int] = None,
                    decay_factor: float = 0.999, steps_per_epoch: int = 1000,
                    accum_grad: int = 1, grad_clip: Optional[float] = 5.0,
                    ft_factor: float = 1.0,
                    updated_modules: Optional[Sequence[str]] = None,
                    flatten: bool = True
                    ) -> optax.GradientTransformation:
    """Build the full update chain for one optimizer group.

    ``flatten=False`` keeps the per-leaf optimizer form (moments mirror the
    param tree) — required by FSDP/ZeRO state sharding
    (parallel/mesh.py shard_state), which shards each moment exactly like
    its parameter; the flat fast path's single concatenated buffer is not
    mesh-divisible.
    """
    optim_conf = dict(optim_conf or {})
    peak_lr = float(optim_conf.pop("lr", 2e-3))
    if sche_type in ("noam", "noam.Noamlr"):
        schedule = noam_schedule(peak_lr, warmup_steps, d_model, ft_factor)
    elif sche_type in ("exp", "exp.ExponentDecayLr"):
        schedule = exp_decay_schedule(peak_lr, decay_factor, steps_per_epoch,
                                      ft_factor)
    elif sche_type == "const":
        schedule = lambda step: peak_lr * ft_factor
    else:
        raise ValueError(f"unknown scheduler {sche_type!r}")

    inner = OPTIMIZERS[optim_type](schedule, optim_conf)
    if updated_modules is None and flatten:
        # fast path: run clip + finite-skip + the optimizer on ONE
        # flattened buffer. The per-leaf form (clip_by_global_norm +
        # apply_if_finite over ~300 param leaves) profiled at ~17 ms/step
        # of tiny reduce/isfinite ops on TPU (probes/profile_step.py);
        # the flat form is a single fused reduction + elementwise pass.
        tx = optax.flatten(_safe_clip_update(inner, grad_clip))
        if accum_grad > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
        return tx
    parts: List[optax.GradientTransformation] = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(inner)
    tx = optax.chain(*parts)
    # grad-inf skip (optim_sche/abs.py:238-247)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=1000000)
    if updated_modules:
        # only update parameters under the given path prefixes
        # (optim_sche/abs.py:112-126 updated_modules parity)
        def label_fn(params):
            import flax
            flat = flax.traverse_util.flatten_dict(params)
            labels = {}
            for path in flat:
                joined = "/".join(str(p) for p in path)
                hit = any(joined.startswith(m) or ("/" + m + "/") in
                          ("/" + joined + "/") for m in updated_modules)
                labels[path] = "update" if hit else "freeze"
            return flax.traverse_util.unflatten_dict(labels)
        tx = optax.multi_transform(
            {"update": tx, "freeze": optax.set_to_zero()}, label_fn)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx


def build_optimizers(optim_sches_cfg: Dict[str, Any], *,
                     steps_per_epoch: int = 1000,
                     accum_grad: int = 1, grad_clip: Optional[float] = 5.0,
                     ft_factor: float = 1.0, flatten: bool = True):
    """Config-driven entry matching the reference ``optim_sches`` block:
    either a single {type, conf} or a dict of named ones, each owning a
    disjoint ``updated_modules`` parameter subset (runner.py:697-772,
    optim_sche/abs.py:112-126)."""
    if "type" in optim_sches_cfg:
        optim_sches_cfg = {"main": optim_sches_cfg}
    txs: Dict[str, optax.GradientTransformation] = {}
    owned: Dict[str, Optional[List[str]]] = {}
    for name, spec in optim_sches_cfg.items():
        conf = dict(spec.get("conf", {}))
        owned[name] = conf.pop("updated_modules", None)
        txs[name] = build_optimizer(
            sche_type=spec.get("type", "noam"),
            optim_type=conf.pop("optim_type", "Adam"),
            optim_conf=conf.pop("optim_conf", {}),
            warmup_steps=conf.pop("warmup_steps", 4000),
            d_model=conf.pop("d_model", None),
            decay_factor=conf.pop("decay_factor", 0.999),
            steps_per_epoch=steps_per_epoch,
            accum_grad=conf.pop("accum_grad", accum_grad),
            grad_clip=conf.pop("grad_clip", grad_clip),
            ft_factor=conf.pop("ft_factor", ft_factor),
            # ownership is resolved by the outer multi_transform below in
            # the multi-optimizer case so transforms never compose serially
            updated_modules=(owned[name] if len(optim_sches_cfg) == 1
                             else None),
            flatten=flatten,
        )
    if len(txs) == 1:
        return next(iter(txs.values()))

    # multiple optimizers: route each parameter to exactly one optimizer by
    # its updated_modules prefixes (overlap check mirrors runner.py:741-755)
    names = list(txs)

    def label_fn(params):
        import flax
        flat = flax.traverse_util.flatten_dict(params)
        labels = {}
        for path in flat:
            joined = "/".join(str(p) for p in path)
            hit = None
            for name in names:
                mods = owned[name]
                if mods is None:
                    continue
                if any(joined.startswith(m) or ("/" + m + "/") in
                       ("/" + joined + "/") for m in mods):
                    assert hit is None, (
                        f"parameter {joined} claimed by both {hit} and "
                        f"{name} (overlapping updated_modules)")
                    hit = name
            if hit is None:
                # unclaimed params go to the first optimizer without an
                # updated_modules restriction, else are frozen
                fallback = [n for n in names if owned[n] is None]
                hit = fallback[0] if fallback else "_frozen"
            labels[path] = hit
        return flax.traverse_util.unflatten_dict(labels)

    return optax.multi_transform({**txs, "_frozen": optax.set_to_zero()},
                                 label_fn)
