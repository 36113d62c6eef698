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

        def loss_fn(params):
            variables = {"params": params, **state.mutables}
            mut = [k for k in mutable_keys if k in state.mutables] \
                if train else []
            if mut:
                outputs, new_mutables = net.apply(
                    variables, batch["feat"], batch["feat_len"],
                    batch["text"], batch["text_len"], train=train,
                    epoch=epoch, axis_name=axis_name,
                    rngs={"dropout": k_drop, "specaug": k_spec},
                    mutable=mut)
            else:
                outputs = net.apply(
                    variables, batch["feat"], batch["feat_len"],
                    batch["text"], batch["text_len"], train=train,
                    epoch=epoch, axis_name=axis_name,
                    rngs={"dropout": k_drop, "specaug": k_spec})
                new_mutables = {}
            loss, metrics = arasr_loss(outputs, batch["text"],
                                       batch["text_len"], cfg)
            return loss, (metrics, dict(new_mutables))

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
