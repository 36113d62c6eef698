"""Train state pytree and jitted step factories.

The TPU replacement for the reference's Runner train loop body
(runner.py:1034-1115): one jitted, shard_map-wrapped function performing
forward, loss, gradient psum, optimizer update, and running-stat mutation —
no host sync inside the hot loop (the reference syncs per step for skip
flags and ``.item()`` metrics; here metrics stay on device until reporting).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any
    mutables: Dict[str, Any]   # 'norm_stats', 'batch_stats' collections


def init_train_state(variables: Dict[str, Any],
                     tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    mutables = {k: v for k, v in variables.items() if k != "params"}
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), mutables=mutables)


def _aux_from_losses(new_mut):
    """Split a flax ``apply`` mutated-collections dict into (aux, rest):
    ``aux`` is the summed leaves of the sown ``losses`` collection (MoE
    load balancing, nn/moe.py sow) or None when nothing was sown; ``rest``
    is what should persist into ``TrainState.mutables``. Every step factory
    below requests ``mutable=[... , 'losses']`` and adds ``aux`` to its
    objective, so ``fdfwd_type: moe`` trains with its balancing loss in
    EVERY family, not just the LM."""
    new_mut = dict(new_mut)
    sown = new_mut.pop("losses", {})
    leaves = jax.tree_util.tree_leaves(sown)
    return (sum(leaves) if leaves else None), new_mut


def make_arasr_step(net, cfg, tx, *, axis_name: Optional[str] = "data",
                    train: bool = True) -> Callable:
    """Build the per-replica ASR train/valid step.

    step(state, batch, rng) -> (state, metrics); batch needs feat/feat_len/
    text/text_len (+ epoch scalar under key 'epoch').
    """
    from speechain_tpu.models.ar_asr import arasr_loss

    mutable_keys = ("norm_stats", "batch_stats")

    def step_fn(state: TrainState, batch: Dict[str, Array], rng: Array
                ) -> Tuple[TrainState, Dict[str, Array]]:
        rng = jax.random.fold_in(rng, state.step)
        k_drop, k_spec = jax.random.split(rng)
        epoch = batch.get("epoch", jnp.zeros((), jnp.int32))
        # speaker indices double as feat-norm group ids when the runner's
        # dataset declares speakers — ONLY under group-mode norm (under
        # global norm a speaker index >= num_groups would one-hot to an
        # all-zero row and silently drop the utterance from the stats)
        group_ids = batch.get("group_ids")
        fn_cfg = getattr(cfg, "feat_norm", None)
        if group_ids is None and fn_cfg is not None \
                and fn_cfg.norm_type == "group":
            group_ids = batch.get("spk_ids")

        def loss_fn(params):
            variables = {"params": params, **state.mutables}
            mut = [k for k in mutable_keys if k in state.mutables] \
                if train else []
            outputs, new_mutables = net.apply(
                variables, batch["feat"], batch["feat_len"],
                batch["text"], batch["text_len"], train=train,
                epoch=epoch, axis_name=axis_name,
                group_ids=group_ids,
                rngs={"dropout": k_drop, "specaug": k_spec},
                mutable=mut + ["losses"])
            aux, new_mutables = _aux_from_losses(new_mutables)
            loss, metrics = arasr_loss(outputs, batch["text"],
                                       batch["text_len"], cfg)
            if aux is not None:
                loss = loss + aux
                metrics = dict(metrics, moe_aux=aux)
            return loss, (metrics, new_mutables)

        if train:
            grads, (metrics, new_mut) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            mutables = {**state.mutables, **new_mut}
            state = TrainState(state.step + 1, params, new_opt, mutables)
        else:
            _, (metrics, _) = loss_fn(state.params)

        # metric averaging weighted by per-replica real batch size
        # (model/abs.py:548-610 reduce-SUM parity)
        if axis_name is not None:
            n = jnp.sum((batch["text_len"] > 0).astype(jnp.float32))
            total = jax.lax.psum(n, axis_name)
            metrics = {k: jax.lax.psum(v * n, axis_name) / total
                       for k, v in metrics.items()}
        return state, metrics

    return step_fn


def _generic_train_step(net_apply_loss, tx, *, axis_name, train,
                        weight_key="text_len"):
    """Shared step skeleton: grad, pmean, optax update, metric averaging."""

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return net_apply_loss(params, state.mutables, batch, rng, train)

        if train:
            grads, (metrics, new_mut) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(state.step + 1, params, new_opt,
                               {**state.mutables, **new_mut})
        else:
            _, (metrics, _) = loss_fn(state.params)
        if axis_name is not None:
            n = jnp.sum((batch[weight_key] > 0).astype(jnp.float32))
            total = jax.lax.psum(n, axis_name)
            metrics = {k: jax.lax.psum(v * n, axis_name) / total
                       for k, v in metrics.items()}
        return state, metrics

    return step_fn


def make_artts_step(net, cfg, tx, *, axis_name: Optional[str] = "data",
                    train: bool = True) -> Callable:
    """AR-TTS train/valid step (model/ar_tts.py criterion pipeline)."""
    from speechain_tpu.models.ar_tts import artts_loss

    mutable_keys = ("norm_stats", "batch_stats")

    def apply_loss(params, mutables, batch, rng, is_train):
        variables = {"params": params, **mutables}
        mut = [k for k in mutable_keys if k in mutables] if is_train else []
        epoch = batch.get("epoch", jnp.zeros((), jnp.int32))
        kwargs = dict(train=is_train, epoch=epoch, axis_name=axis_name,
                      spk_ids=batch.get("spk_ids"),
                      spk_feat=batch.get("spk_feat"),
                      rngs={"dropout": rng})
        outputs, new_mut = net.apply(
            variables, batch["text"], batch["text_len"], batch["feat"],
            batch["feat_len"], mutable=mut + ["losses"], **kwargs)
        aux, new_mut = _aux_from_losses(new_mut)
        loss, metrics = artts_loss(outputs, cfg)
        if aux is not None:
            loss = loss + aux
            metrics = dict(metrics, moe_aux=aux)
        return loss, (metrics, new_mut)

    return _generic_train_step(apply_loss, tx, axis_name=axis_name,
                               train=train)


def make_fastspeech2_step(net, cfg, tx, *, axis_name: Optional[str] = "data",
                          train: bool = True) -> Callable:
    """FastSpeech2 train/valid step (model/nar_tts.py criterion pipeline).

    batch needs text/text_len/feat/feat_len/pitch/pitch_len/duration/
    duration_len (MFA teacher durations)."""
    from speechain_tpu.models.nar_tts import fastspeech2_loss

    mutable_keys = ("norm_stats", "batch_stats")

    def apply_loss(params, mutables, batch, rng, is_train):
        variables = {"params": params, **mutables}
        mut = [k for k in mutable_keys if k in mutables] if is_train else []
        epoch = batch.get("epoch", jnp.zeros((), jnp.int32))
        kwargs = dict(train=is_train, epoch=epoch, axis_name=axis_name,
                      spk_ids=batch.get("spk_ids"),
                      spk_feat=batch.get("spk_feat"),
                      rngs={"dropout": rng})
        args = (batch["text"], batch["text_len"], batch["feat"],
                batch["feat_len"], batch["pitch"], batch["pitch_len"],
                batch["duration"], batch["duration_len"])
        outputs, new_mut = net.apply(variables, *args,
                                     mutable=mut + ["losses"], **kwargs)
        aux, new_mut = _aux_from_losses(new_mut)
        loss, metrics = fastspeech2_loss(outputs, batch["duration"], cfg)
        if aux is not None:
            loss = loss + aux
            metrics = dict(metrics, moe_aux=aux)
        return loss, (metrics, new_mut)

    return _generic_train_step(apply_loss, tx, axis_name=axis_name,
                               train=train)


def make_lm_step(net, tx, *, label_smoothing: float = 0.0,
                 axis_name: Optional[str] = "data",
                 train: bool = True) -> Callable:
    """LM train/valid step (model/lm.py)."""
    from speechain_tpu.models.lm import lm_loss

    def apply_loss(params, mutables, batch, rng, is_train):
        variables = {"params": params, **mutables}
        (logits, _, _), sown = net.apply(variables, batch["text"],
                                         batch["text_len"], train=is_train,
                                         rngs={"dropout": rng},
                                         mutable=["losses"])
        loss, metrics = lm_loss(logits, batch["text"], batch["text_len"],
                                label_smoothing=label_smoothing)
        # auxiliary losses sown by modules (MoE load balancing, nn/moe.py)
        aux_leaves = jax.tree_util.tree_leaves(sown.get("losses", {}))
        if aux_leaves:
            aux = sum(aux_leaves)
            loss = loss + aux
            metrics = dict(metrics, moe_aux=aux)
        return loss, (metrics, {})

    return _generic_train_step(apply_loss, tx, axis_name=axis_name,
                               train=train)


def make_multi_domain_step(apply_loss, tx, *,
                           loss_weights: Optional[Dict[str, float]] = None,
                           axis_name: Optional[str] = "data",
                           train: bool = True) -> Callable:
    """Generic multi-dataloader step over any family's apply_loss closure
    (the MultiDomainARTTS analog of make_multi_domain_arasr_step,
    model/ar_tts.py:977): batch = {domain: sub-batch}; total loss is the
    loss_weights-weighted sum normalized by the weight sum."""

    def step_fn(state: TrainState, batches: Dict[str, Dict[str, Array]],
                rng: Array) -> Tuple[TrainState, Dict[str, Array]]:
        rng = jax.random.fold_in(rng, state.step)
        domains = sorted(batches.keys())
        weights = {d: float((loss_weights or {}).get(d, 1.0))
                   for d in domains}
        w_sum = sum(weights.values())

        def loss_fn(params):
            mutables = dict(state.mutables)
            total = 0.0
            metrics: Dict[str, Array] = {}
            for i, d in enumerate(domains):
                k = jax.random.fold_in(rng, i)
                d_loss, (d_metrics, new_mut) = apply_loss(
                    params, mutables, batches[d], k, train)
                mutables.update(new_mut)
                total = total + weights[d] * d_loss
                metrics.update({f"{d}_{mk}": mv
                                for mk, mv in d_metrics.items()})
            total = total / w_sum
            metrics["loss"] = total
            return total, (metrics, mutables)

        if train:
            grads, (metrics, new_mut) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(state.step + 1, params, new_opt, new_mut)
        else:
            _, (metrics, _) = loss_fn(state.params)
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name)
                       for k, v in metrics.items()}
        return state, metrics

    return step_fn


def make_multi_domain_artts_step(net, cfg, tx, *,
                                 loss_weights: Optional[Dict[str, float]]
                                 = None,
                                 axis_name: Optional[str] = "data",
                                 train: bool = True) -> Callable:
    """Multi-dataloader AR-TTS step (MultiDomainARTTS,
    model/ar_tts.py:977-...): per-domain artts_loss, weighted sum."""
    from speechain_tpu.models.ar_tts import artts_loss

    mutable_keys = ("norm_stats", "batch_stats")

    def apply_loss(params, mutables, batch, rng, is_train):
        variables = {"params": params, **mutables}
        mut = [k for k in mutable_keys if k in mutables] if is_train else []
        epoch = batch.get("epoch", jnp.zeros((), jnp.int32))
        kwargs = dict(train=is_train, epoch=epoch, axis_name=axis_name,
                      spk_ids=batch.get("spk_ids"),
                      spk_feat=batch.get("spk_feat"),
                      rngs={"dropout": rng})
        outputs, new_mut = net.apply(
            variables, batch["text"], batch["text_len"], batch["feat"],
            batch["feat_len"], mutable=mut + ["losses"], **kwargs)
        aux, new_mut = _aux_from_losses(new_mut)
        loss, metrics = artts_loss(outputs, cfg)
        if aux is not None:
            loss = loss + aux
            metrics = dict(metrics, moe_aux=aux)
        return loss, (metrics, new_mut)

    return make_multi_domain_step(apply_loss, tx, loss_weights=loss_weights,
                                  axis_name=axis_name, train=train)


def make_multi_domain_arasr_step(net, cfg, tx, *,
                                 loss_weights: Optional[Dict[str, float]]
                                 = None,
                                 axis_name: Optional[str] = "data",
                                 train: bool = True) -> Callable:
    """Multi-dataloader semi-supervised ASR step
    (MultiDataLoaderARASR, model/ar_asr.py:1044-1276).

    batch is a dict of named domain sub-batches ({'real': {...},
    'syn': {...}}); each domain runs its own forward/loss, the total loss is
    the loss_weights-weighted sum (normalized by the weight sum,
    ar_asr.py:1249-1276), one optimizer step updates on the combined grads.
    """
    from speechain_tpu.models.ar_asr import arasr_loss

    mutable_keys = ("norm_stats", "batch_stats")

    def step_fn(state: TrainState, batches: Dict[str, Dict[str, Array]],
                rng: Array) -> Tuple[TrainState, Dict[str, Array]]:
        rng = jax.random.fold_in(rng, state.step)
        domains = sorted(batches.keys())
        weights = {d: float((loss_weights or {}).get(d, 1.0))
                   for d in domains}
        w_sum = sum(weights.values())

        def loss_fn(params):
            mutables = dict(state.mutables)
            total = 0.0
            metrics: Dict[str, Array] = {}
            for i, d in enumerate(domains):
                b = batches[d]
                k_drop, k_spec = jax.random.split(
                    jax.random.fold_in(rng, i))
                variables = {"params": params, **mutables}
                mut = [k for k in mutable_keys if k in mutables] \
                    if train else []
                epoch = b.get("epoch", jnp.zeros((), jnp.int32))
                outputs, new_mut = net.apply(
                    variables, b["feat"], b["feat_len"], b["text"],
                    b["text_len"], train=train, epoch=epoch,
                    axis_name=axis_name,
                    rngs={"dropout": k_drop, "specaug": k_spec},
                    mutable=mut + ["losses"])
                aux, new_mut = _aux_from_losses(new_mut)
                mutables.update(new_mut)
                d_loss, d_metrics = arasr_loss(outputs, b["text"],
                                               b["text_len"], cfg)
                if aux is not None:
                    d_loss = d_loss + aux
                    d_metrics = dict(d_metrics, moe_aux=aux)
                total = total + weights[d] * d_loss
                metrics.update({f"{d}_{k}": v for k, v in d_metrics.items()})
            total = total / w_sum
            metrics["loss"] = total
            return total, (metrics, mutables)

        if train:
            grads, (metrics, new_mut) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(state.step + 1, params, new_opt, new_mut)
        else:
            _, (metrics, _) = loss_fn(state.params)
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name)
                       for k, v in metrics.items()}
        return state, metrics

    return step_fn
