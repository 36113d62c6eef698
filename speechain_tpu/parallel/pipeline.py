"""Pipeline parallelism over a 'pipe' mesh axis — GPipe fill-drain.

The reference framework has no model parallelism at all (its scaling story
is single-node DDP, reference runner.py:221/2014); this module is a
TPU-native extension: a homogeneous stack of layers is split into S
stages, one per device along the 'pipe' mesh axis, and microbatches flow
stage-to-stage via ``lax.ppermute`` (collectives ride the ICI ring). The
schedule is the classic fill-drain (GPipe) loop expressed as a
``lax.scan`` inside ``shard_map``: tick t feeds microbatch t into stage 0
while every other stage processes what it received on tick t-1.

Differentiable end-to-end: the gradient of a ``ppermute`` is the reverse
``ppermute`` (and of ``all_to_all`` the reverse ``all_to_all``), so
wrapping the pipeline in a loss and calling ``jax.grad`` yields
pipeline-parallel backprop without extra code.

Gradient accumulation is the microbatch count itself: ``n_micro = S * A``
runs A fill-drain waves' worth of microbatches through one backward pass —
the GPipe accumulation window — with loss averaged over all microbatches.

Two entry points:

- :func:`pipeline_apply` — generic activation-in/activation-out pipeline
  over any same-shape residual ``layer_fn``; output assembly uses a single
  ``all_to_all`` scatter (each stage ends holding 1/S of the result and
  the shard_map out_spec reassembles it) instead of the old masked-psum
  broadcast, so no stage ever materializes the full output.
- :func:`make_lm_pipeline_step` — the REAL-model training path: the
  flagship ``LanguageModelNet`` stage-split across 'pipe' (embedding +
  posenc replicated, encoder layers pipelined, final-LN + postnet + loss
  on the last stage, scalar loss psum'd), numerically matching the
  sequential ``make_lm_step`` on the same batch. Selectable from the
  runner via ``--mesh pipe=S`` / ``train_cfg.parallel``.
- :func:`make_arasr_pipeline_step` — the encoder-decoder flagship:
  ARASR with a transformer encoder pipelined over 'pipe'; after the
  fill-drain wave the encoder outputs are scattered (one ``all_to_all``)
  so every stage runs the FULL decoder + heads + losses on its own 1/S
  share of the batch — the decoder is data-parallel across the pipe
  stages rather than replicated garbage compute. Losses recombine
  exactly (per-share numerator/denominator sums psum'd over 'pipe')
  so the step matches the sequential ``make_arasr_step`` at 1e-6.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def stack_layer_params(params_list: Sequence[Any]):
    """Stack per-layer param pytrees (identical structure) along a new
    leading 'layer' axis — the layout the pipeline shards over 'pipe'."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, 0), *params_list)


def _fill_drain(run_stage: Callable[[Array, Array], Array], micro: Array,
                stage: Array, S: int, n_micro: int, axis: str) -> Array:
    """The GPipe schedule inside a shard_map body.

    ``run_stage(h, m)`` applies this stage's layers to activations ``h``
    belonging to microbatch ``m`` (a traced index — used for per-microbatch
    aux data and rng folding). ``micro``: (n_micro, mb, ...) local
    microbatch queue (replicated over 'pipe'). Returns this stage's per-tick
    outputs ``(n_ticks, mb, ...)``; the last stage's ticks ``S-1:`` are the
    pipeline results in microbatch order.
    """
    zero = jnp.zeros_like(micro[0])
    n_ticks = n_micro + S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]

    def tick(carry, t):
        recv = carry
        feed = jnp.where(t < n_micro, micro[jnp.minimum(t, n_micro - 1)],
                         zero)
        h = jnp.where(stage == 0, feed, recv)
        m = jnp.clip(t - stage, 0, n_micro - 1)
        out = run_stage(h, m)
        nxt = jax.lax.ppermute(out, axis, perm)
        return nxt, out

    _, outs = jax.lax.scan(tick, zero, jnp.arange(n_ticks))
    return outs


def _scatter_from_last(valid: Array, S: int, axis: str) -> Array:
    """Distribute the last stage's assembled outputs across stages.

    ``valid``: (n_micro, mb, ...) — correct data on stage S-1 only. One
    ``all_to_all`` sends chunk j of the last stage's buffer to stage j
    (every stage's garbage rides along but total traffic is ~= one copy of
    the output, vs the old masked-psum broadcast which also left a FULL
    copy resident on every stage). Each stage keeps the slice that
    originated at stage S-1 — its own 1/S share, reassembled globally by
    the caller's ``out_specs=P(axis, ...)``."""
    n_micro = valid.shape[0]
    assert n_micro % S == 0, (n_micro, S)
    k = n_micro // S
    buf = valid.reshape(S, k, *valid.shape[1:])
    recv = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                              tiled=True)          # (S, k, ...) per stage
    return recv[S - 1]                             # chunk from stage S-1


def pipeline_apply(layer_fn: Callable, stacked_params: Any, x: Array,
                   mesh: Mesh, *, n_micro: Optional[int] = None,
                   axis: str = "pipe", remat: bool = False) -> Array:
    """Apply ``L`` stacked layers as an ``S``-stage GPipe pipeline.

    Args:
      layer_fn: pure per-layer function ``(params, x) -> x`` (same shapes
        in and out — a residual block).
      stacked_params: param pytree with a leading axis of size ``L``
        (:func:`stack_layer_params`); ``L`` must be divisible by the size
        ``S`` of the ``axis`` dimension of ``mesh``. Each stage runs the
        ``L // S`` consecutive layers it owns.
      x: global batch ``(B, ...)``; split into ``n_micro`` microbatches on
        dim 0 (default: one per stage; ``n_micro = S*A`` gives an A-wide
        gradient-accumulation window).
      mesh: mesh containing ``axis``.

    Returns the globally-assembled output batch ``(B, ...)``.
    """
    S = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    n_micro = n_micro or S
    assert n_micro % S == 0, (n_micro, S)
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    micro = x.reshape(n_micro, mb, *x.shape[1:])

    # stage s owns layers [s*K, (s+1)*K): shard the stacked layer axis
    param_specs = jax.tree_util.tree_map(
        lambda l: P(*((axis,) + (None,) * (l.ndim - 1))), stacked_params)

    # backward rematerialization (the JAX-native analog of 1F1B's memory
    # bound): each tick's residual stash shrinks to the stage-boundary
    # activation; layer internals are recomputed in the backward wave
    apply_fn = jax.checkpoint(layer_fn) if remat else layer_fn

    def staged(local_params, micro_local):
        stage = jax.lax.axis_index(axis)

        def run_stage(h, m):
            def body(hh, p):
                return apply_fn(p, hh), None
            h, _ = jax.lax.scan(body, h, local_params)
            return h

        outs = _fill_drain(run_stage, micro_local, stage, S, n_micro, axis)
        share = _scatter_from_last(outs[S - 1:], S, axis)  # (n_micro/S, ...)
        return share

    pf = jax.shard_map(staged, mesh=mesh, in_specs=(param_specs, P()),
                       out_specs=P(axis), check_vma=False)
    out = pf(stacked_params, micro)                # (n_micro, mb, ...)
    return out.reshape(B, *x.shape[1:])


def make_lm_pipeline_step(net, tx, mesh, *, n_micro: Optional[int] = None,
                          label_smoothing: float = 0.0, train: bool = True,
                          axis: str = "pipe",
                          donate_state: bool = True) -> Callable:
    """Pipeline-parallel train/valid step for the REAL LanguageModelNet.

    Stage split (nn/lm.py structure, cited per piece):
    - embedding (``EmbedPrenet``) + posenc + causal mask: computed
      replicated on every stage (cheap; avoids an entry collective);
    - the ``num_layers`` TransformerEncoder layers: stacked along a layer
      axis and sharded over 'pipe' — the GPipe loop above;
    - final LayerNorm + ``TokenPostnet`` + ``lm_loss``: computed from the
      last stage's drained outputs; only the SCALAR loss/metrics cross
      stages (masked psum over 'pipe'), never activations — the scalable
      replacement for broadcasting logits.

    The param tree is the UNMODIFIED LanguageModelNet tree (checkpoints,
    optimizer state and the rest of the runner are oblivious to the
    pipeline); layer subtrees are stacked/unstacked inside the jitted step,
    which XLA folds into layout moves.

    Supports a ('data', 'pipe') mesh: batch rows shard over 'data', the
    schedule runs per data shard, metrics/grads reduce over both axes.
    With ``n_micro = S * A`` the fill-drain window accumulates gradients
    over A waves of microbatches (GPipe accumulation).

    Numerics: identical to ``make_lm_step`` up to float-op reordering
    (tests assert 1e-6 agreement with dropout disabled; with dropout on,
    draws are folded per (microbatch, layer) — a different but valid
    stream).
    """
    import flax.linen as nn

    from speechain_tpu.models.lm import lm_loss
    from speechain_tpu.nn.posenc import PositionalEncoding
    from speechain_tpu.nn.postnets import TokenPostnet
    from speechain_tpu.nn.prenets import EmbedPrenet
    from speechain_tpu.nn.transformer import (TransformerEncoder,
                                              TransformerEncoderLayer)
    from speechain_tpu.utils.masks import make_mask_from_len, subsequent_mask

    c = net.cfg
    enc_conf = dict(c.encoder)
    enc_conf["uni_direction"] = True
    e = TransformerEncoder(dtype=c.dtype, **enc_conf)  # field defaults only
    embed = EmbedPrenet(vocab_size=c.vocab_size, dtype=c.dtype, **c.emb)
    posenc = PositionalEncoding(
        d_model=e.d_model, posenc_type=e.posenc_type,
        emb_layernorm=e.emb_layernorm, emb_scale=e.emb_scale,
        posenc_scale=e.posenc_scale, init_alpha=e.posenc_init_alpha,
        dropout=e.posenc_dropout, max_len=e.posenc_maxlen)
    layer = TransformerEncoderLayer(
        d_model=e.d_model, num_heads=e.num_heads,
        scale_dp_by_head=e.scale_dp_by_head, att_dropout=e.att_dropout,
        fdfwd_dim=e.fdfwd_dim, fdfwd_type=e.fdfwd_type,
        fdfwd_activation=e.fdfwd_activation, fdfwd_args=e.fdfwd_args,
        fdfwd_dropout=e.fdfwd_dropout, res_dropout=e.res_dropout,
        layernorm_first=e.layernorm_first, dtype=e.dtype)
    final_ln = nn.LayerNorm(epsilon=1e-6)
    postnet = TokenPostnet(vocab_size=c.vocab_size, dtype=c.dtype)

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    S = sizes[axis]
    n_data = sizes.get("data", 1)
    data_axis = "data" if "data" in mesh.axis_names and n_data > 1 else None
    L = e.num_layers
    assert L % S == 0, f"num_layers {L} not divisible by pipe={S}"
    K = L // S
    n_micro = n_micro or S
    assert n_micro % S == 0, (n_micro, S)

    import optax

    from speechain_tpu.train.state import TrainState

    def forward(params, text, text_len, key):
        """Runs INSIDE shard_map on one (data-shard, stage) device."""
        stage = jax.lax.axis_index(axis)
        stacked = params["stacked"]               # leaves (K, ...) local
        B, Lx = text.shape
        assert B % n_micro == 0, (B, n_micro)
        mb = B // n_micro

        emb = embed.apply({"params": params["embedding"]}, text)
        x = posenc.apply({"params": params.get("posenc", {})}, emb,
                         train=train,
                         rngs={"dropout": jax.random.fold_in(key, 2 ** 20)})
        mask = make_mask_from_len(text_len, Lx) & subsequent_mask(Lx)
        mask = jnp.broadcast_to(mask, (B, Lx, Lx))
        micro = x.reshape(n_micro, mb, Lx, x.shape[-1])
        micro_mask = mask.reshape(n_micro, mb, Lx, Lx)

        def apply_layer(p_i, hh, m_mask, k_i):
            out, _ = layer.apply({"params": p_i}, hh, m_mask,
                                 train=train, return_attmat=False,
                                 rngs={"dropout": k_i})
            return out

        if e.remat:
            # encoder.remat from the recipe config: recompute layer
            # internals in the backward wave (nn/transformer.py:184 law,
            # extended into the pipeline schedule)
            apply_layer = jax.checkpoint(apply_layer)

        def run_stage(h, m):
            def body(hh, xs):
                p_i, idx = xs
                # rng folded by (microbatch, global layer) — independent of
                # the pipeline schedule, so draws don't depend on S
                k_i = jax.random.fold_in(jax.random.fold_in(key, m),
                                         stage * K + idx)
                return apply_layer(p_i, hh, micro_mask[m], k_i), None
            h, _ = jax.lax.scan(body, h, (stacked, jnp.arange(K)))
            return h

        outs = _fill_drain(run_stage, micro, stage, S, n_micro, axis)
        valid = outs[S - 1:]                      # (n_micro, mb, Lx, D)
        h = valid.reshape(B, Lx, valid.shape[-1])
        if e.layernorm_first:
            h = final_ln.apply({"params": params["layernorm"]}, h)
        logits = postnet.apply({"params": params["postnet"]}, h)
        loss, metrics = lm_loss(logits, text, text_len,
                                label_smoothing=label_smoothing)
        # only the LAST stage holds real drained outputs: zero the others
        # and reduce scalars over 'pipe' (activations never cross stages
        # again — the scalable replacement for the old psum broadcast)
        is_last = (stage == S - 1).astype(loss.dtype)
        loss = jax.lax.psum(loss * is_last, axis)
        metrics = {k: jax.lax.psum(v * is_last, axis)
                   for k, v in metrics.items()}
        if data_axis is not None:
            metrics = {k: jax.lax.pmean(v, data_axis)
                       for k, v in metrics.items()}
        return loss, metrics

    def regroup(params):
        """LanguageModelNet tree -> pipeline layout (stack layer subtrees)."""
        enc_p = params["encoder"]
        out = {"embedding": params["embedding"],
               "postnet": params["postnet"],
               "stacked": stack_layer_params(
                   [enc_p[f"layer_{i}"] for i in range(L)])}
        if "layernorm" in enc_p:
            out["layernorm"] = enc_p["layernorm"]
        if "posenc" in enc_p:
            out["posenc"] = enc_p["posenc"]
        return out

    # (gradients come back in the ORIGINAL LanguageModelNet layout because
    # jax.grad differentiates through regroup's stacking)

    # shard_map specs: stacked layer axis over 'pipe'; everything else
    # replicated over 'pipe'; batch rows over 'data' when present
    def param_specs_of(p):
        return {
            k: (jax.tree_util.tree_map(
                lambda l: P(*((axis,) + (None,) * (l.ndim - 1))), v)
                if k == "stacked"
                else jax.tree_util.tree_map(lambda l: P(), v))
            for k, v in p.items()}

    bspec = P(data_axis) if data_axis else P()

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        text, text_len = batch["text"], batch["text_len"]

        def loss_fn(params):
            grouped = regroup(params)
            smapped = jax.shard_map(
                forward, mesh=mesh,
                in_specs=(param_specs_of(grouped), bspec, bspec, P()),
                out_specs=(P(), P()), check_vma=False)
            loss, metrics = smapped(grouped, text, text_len, rng)
            return loss, metrics

        if train:
            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(state.step + 1, params, new_opt,
                               state.mutables)
        else:
            _, metrics = loss_fn(state.params)
        return state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())


def make_arasr_pipeline_step(net, cfg, tx, mesh, *,
                             n_micro: Optional[int] = None,
                             train: bool = True, axis: str = "pipe",
                             donate_state: bool = True) -> Callable:
    """Pipeline-parallel train/valid step for the REAL ARASRNet.

    Stage split (models/ar_asr.py structure, cited per piece):

    - frontend (log-Mel + feat-norm + SpecAugment) and the Conv2d prenet:
      computed REPLICATED on every stage over the full per-data-shard
      batch (cheap relative to the encoder; keeps the feat-norm /
      BatchNorm running-stat laws identical to the sequential step — the
      moments see the whole batch, and every stage derives the same new
      stats);
    - the transformer encoder layers: stacked along a layer axis and
      sharded over 'pipe' — the GPipe fill-drain loop, microbatch count
      ``n_micro = S * A`` giving an A-wide gradient-accumulation window;
    - decoder + postnet + CTC head + losses: after the wave, ONE
      ``all_to_all`` leaves each stage holding its own 1/S share of the
      encoder output (microbatch-contiguous rows), and each stage runs
      the full decoder on its share — decoder compute is data-parallel
      across pipe stages instead of replicated. Only per-criterion
      (numerator, denominator) SUMS cross stages (psum over 'pipe');
      they recombine to exactly the sequential ``arasr_loss`` reductions
      (criteria.py: every reduction is sum(num)/max(sum(den), 1)).

    Constraints (asserted): ``encoder_type == 'transformer'`` — the
    conformer's BatchNorm law takes batch moments over the FULL batch
    (ops parity with the reference), which microbatched pipelining cannot
    reproduce without serializing the schedule; ``fdfwd_type != 'moe'``
    (expert parallelism uses its own axis). ``num_layers % pipe == 0``.

    The param tree is the UNMODIFIED ARASRNet tree (checkpoints and the
    runner are oblivious); layer subtrees are stacked inside the jitted
    step. RNG law matches the sequential step where the computation is
    replicated (SpecAugment draws from the same folded key), and folds by
    (microbatch, global layer) inside the pipeline — schedule-independent
    but a different (valid) stream, so exact-match tests run with dropout
    disabled, like the LM pipeline.
    """
    import flax.linen as nn
    import optax

    from speechain_tpu.models.ar_asr import ASRFrontend
    from speechain_tpu.nn.posenc import PositionalEncoding
    from speechain_tpu.nn.postnets import TokenPostnet
    from speechain_tpu.nn.prenets import Conv2dPrenet, EmbedPrenet
    from speechain_tpu.nn.transformer import (TransformerDecoder,
                                              TransformerEncoder,
                                              TransformerEncoderLayer)
    from speechain_tpu.train import criteria
    from speechain_tpu.train.state import TrainState
    from speechain_tpu.utils.masks import make_mask_from_len

    c = cfg
    assert c.encoder_type == "transformer", (
        "pipe>1 requires a transformer ASR encoder: the conformer BatchNorm "
        "law (batch moments over the full batch) cannot be reproduced under "
        "microbatched pipelining")
    assert dict(c.encoder).get("fdfwd_type", "linear") != "moe", (
        "pipe cannot stage-split MoE layers; use the 'expert' axis")

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    S = sizes[axis]
    n_data = sizes.get("data", 1)
    data_axis = "data" if "data" in mesh.axis_names and n_data > 1 else None

    e = TransformerEncoder(dtype=c.dtype, **dict(c.encoder))
    L = e.num_layers
    assert L % S == 0, f"encoder num_layers {L} not divisible by pipe={S}"
    K = L // S
    n_micro = n_micro or S
    assert n_micro % S == 0, (n_micro, S)

    frontend = ASRFrontend(frontend=c.frontend, feat_norm=c.feat_norm,
                           specaug=c.specaug)
    prenet = Conv2dPrenet(dtype=c.dtype,
                          bn_axis_name=data_axis, **dict(c.enc_prenet))
    posenc = PositionalEncoding(
        d_model=e.d_model, posenc_type=e.posenc_type,
        emb_layernorm=e.emb_layernorm, emb_scale=e.emb_scale,
        posenc_scale=e.posenc_scale, init_alpha=e.posenc_init_alpha,
        dropout=e.posenc_dropout, max_len=e.posenc_maxlen)
    layer = TransformerEncoderLayer(
        d_model=e.d_model, num_heads=e.num_heads,
        scale_dp_by_head=e.scale_dp_by_head, att_dropout=e.att_dropout,
        fdfwd_dim=e.fdfwd_dim, fdfwd_type=e.fdfwd_type,
        fdfwd_activation=e.fdfwd_activation, fdfwd_args=e.fdfwd_args,
        fdfwd_dropout=e.fdfwd_dropout, res_dropout=e.res_dropout,
        layernorm_first=e.layernorm_first, dtype=e.dtype)
    final_ln = nn.LayerNorm(epsilon=1e-6)
    dec_emb = EmbedPrenet(vocab_size=c.vocab_size, dtype=c.dtype,
                          **dict(c.dec_emb))
    decoder = TransformerDecoder(dtype=c.dtype, **dict(c.decoder))
    postnet = TokenPostnet(vocab_size=c.vocab_size, dtype=c.dtype)
    ctc_head = (TokenPostnet(vocab_size=c.vocab_size, dtype=c.dtype)
                if c.ctc_weight > 0.0 else None)

    def _slice_share(x, stage, share):
        return jax.lax.dynamic_slice_in_dim(x, stage * share, share, 0)

    def forward(params, mutables, feat, feat_len, text, text_len,
                group_ids, epoch, key):
        """Runs INSIDE shard_map on one (data-shard, stage) device.
        ``params`` is the regrouped tree (stacked encoder layers local)."""
        stage = jax.lax.axis_index(axis)
        k_drop, k_spec = jax.random.split(key)

        # --- replicated front: frontend + prenet over the full local batch
        fr_vars = {"norm_stats": mutables["norm_stats"]["frontend"]} \
            if "norm_stats" in mutables else {}
        fr_kwargs = dict(train=train, epoch=epoch, group_ids=group_ids,
                         axis_name=data_axis, rngs={"specaug": k_spec})
        if train and fr_vars:
            (x, x_len), new_fr = frontend.apply(
                fr_vars, feat, feat_len, mutable=["norm_stats"], **fr_kwargs)
        else:
            x, x_len = frontend.apply(fr_vars, feat, feat_len, **fr_kwargs)
            new_fr = {}
        x = x.astype(c.dtype)
        pn_vars = {"params": params["enc_prenet"]}
        if "batch_stats" in mutables and "enc_prenet" in mutables["batch_stats"]:
            pn_vars["batch_stats"] = mutables["batch_stats"]["enc_prenet"]
        pn_kwargs = dict(
            train=train,
            rngs={"dropout": jax.random.fold_in(k_drop, 2 ** 22)})
        if train and "batch_stats" in pn_vars:
            (x, x_len), new_pn = prenet.apply(
                pn_vars, x, x_len, mutable=["batch_stats"], **pn_kwargs)
        else:
            x, x_len = prenet.apply(pn_vars, x, x_len, **pn_kwargs)
            new_pn = {}
        B, T2, D = x.shape
        assert B % n_micro == 0, (B, n_micro)
        mb = B // n_micro
        share = B // S
        mask = make_mask_from_len(x_len, T2)           # (B, 1, T2)
        x = posenc.apply(
            {"params": params.get("posenc", {})}, x, train=train,
            rngs={"dropout": jax.random.fold_in(k_drop, 2 ** 20)})

        # --- pipelined encoder layers (GPipe fill-drain over 'pipe')
        stacked = params["stacked"]                    # leaves (K, ...) local
        micro = x.reshape(n_micro, mb, T2, D)
        micro_mask = mask.reshape(n_micro, mb, 1, T2)

        def apply_layer(p_i, hh, m_mask, k_i):
            out, _ = layer.apply({"params": p_i}, hh, m_mask,
                                 train=train, return_attmat=False,
                                 rngs={"dropout": k_i})
            return out

        if e.remat:
            # encoder.remat from the recipe config (see make_lm_pipeline_step)
            apply_layer = jax.checkpoint(apply_layer)

        def run_stage(h, m):
            def body(hh, xs):
                p_i, idx = xs
                k_i = jax.random.fold_in(jax.random.fold_in(k_drop, m),
                                         stage * K + idx)
                return apply_layer(p_i, hh, micro_mask[m], k_i), None
            h, _ = jax.lax.scan(body, h, (stacked, jnp.arange(K)))
            return h

        outs = _fill_drain(run_stage, micro, stage, S, n_micro, axis)
        enc_share = _scatter_from_last(outs[S - 1:], S, axis)
        enc_share = enc_share.reshape(share, T2, D)
        if e.layernorm_first:
            enc_share = final_ln.apply({"params": params["layernorm"]},
                                       enc_share)

        # --- per-share decoder + heads (data-parallel across pipe stages):
        # stage j owns batch rows [j*share, (j+1)*share)
        t_share = _slice_share(text, stage, share)
        tl_share = _slice_share(text_len, stage, share)
        el_share = _slice_share(x_len, stage, share)
        em_share = make_mask_from_len(el_share, T2)

        k_dec = jax.random.fold_in(jax.random.fold_in(k_drop, 2 ** 21), stage)
        need_att = c.att_guid_sigma > 0.0

        def run_decoder(enc_f, enc_m, rng_tag, tr):
            tgt_in = t_share[:, :-1]
            emb = dec_emb.apply({"params": params["dec_emb"]}, tgt_in)
            tgt_mask = make_mask_from_len(jnp.maximum(tl_share - 1, 0),
                                          tgt_in.shape[1])
            out, _, cross, _ = decoder.apply(
                {"params": params["decoder"]}, emb, enc_f, tgt_mask, enc_m,
                train=tr, return_attmat=need_att,
                rngs={"dropout": jax.random.fold_in(k_dec, rng_tag)})
            return postnet.apply({"params": params["postnet"]}, out), cross

        logits, cross_att = run_decoder(enc_share, em_share, 0, train)

        # --- losses: per-share (num, den) sums, psum'd over 'pipe', then
        # recombined exactly as arasr_loss (models/ar_asr.py:241-271).
        # Every criteria reduction is sum(num)/max(sum(den), 1), so
        # num_local = criterion * max(den_local, 1) recombines exactly.
        def gsum(v):
            return jax.lax.psum(v, axis)

        def combine(value, den_local):
            num = value * jnp.maximum(den_local, 1.0)
            return gsum(num) / jnp.maximum(gsum(den_local), 1.0)

        ce_den = jnp.sum((tl_share - 1 > 0).astype(jnp.float32))
        ce = combine(criteria.cross_entropy(
            logits, t_share, tl_share, label_smoothing=c.label_smoothing),
            ce_den)
        acc_den = jnp.sum(jnp.maximum(tl_share - 1, 0)).astype(jnp.float32)
        acc = combine(criteria.accuracy(logits, t_share, tl_share), acc_den)
        loss = ce
        metrics = dict(ce_loss=ce, accuracy=acc)
        if c.ctc_weight > 0.0:
            ctc_logits = ctc_head.apply({"params": params["ctc_head"]},
                                        enc_share)
            ctc_text = t_share[:, 1:]
            ctc_len = jnp.maximum(tl_share - 2, 0)
            ctc_den = jnp.sum((ctc_len > 0).astype(jnp.float32))
            ctc = combine(criteria.ctc_loss(ctc_logits, el_share, ctc_text,
                                            ctc_len), ctc_den)
            loss = (1.0 - c.ctc_weight) * loss + c.ctc_weight * ctc
            metrics["ctc_loss"] = ctc
        if c.ilm_weight > 0.0:
            # train=False like the sequential ilm_decode (ar_asr.py:202-210,
            # which calls self.decode with its train default)
            zeros = jnp.zeros_like(enc_share)
            ones_m = jnp.ones((share, 1, T2), bool)
            ilm_logits, _ = run_decoder(zeros, ones_m, 1, False)
            ilm = combine(criteria.cross_entropy(
                ilm_logits, t_share, tl_share,
                label_smoothing=c.label_smoothing), ce_den)
            loss = loss + c.ilm_weight * ilm
            metrics["ilm_loss"] = ilm
        if need_att and cross_att:
            att = cross_att[0]
            X, Y = att.shape[2], att.shape[3]
            xl = jnp.clip(jnp.maximum(tl_share - 1, 0), max=X)
            yl = jnp.clip(el_share, max=Y)
            ag_den = (jnp.sum(xl.astype(jnp.float32) * yl.astype(jnp.float32))
                      * att.shape[1])
            ag = combine(criteria.attention_guidance(
                att, jnp.maximum(tl_share - 1, 0), el_share,
                sigma=c.att_guid_sigma), ag_den)
            loss = loss + ag
            metrics["att_guid_loss"] = ag
        metrics["loss"] = loss

        # metric averaging weighted by per-replica real batch size, as in
        # make_arasr_step (train/state.py:107-113)
        if data_axis is not None:
            n = jnp.sum((text_len > 0).astype(jnp.float32))
            total = jax.lax.psum(n, data_axis)
            metrics = {k: jax.lax.psum(v * n, data_axis) / total
                       for k, v in metrics.items()}

        new_mut = {}
        if new_fr:
            new_mut["norm_stats"] = {"frontend": new_fr["norm_stats"]}
        if new_pn:
            new_mut["batch_stats"] = {"enc_prenet": new_pn["batch_stats"]}
        return loss, metrics, new_mut

    def regroup(params):
        """ARASRNet tree -> pipeline layout (stack encoder layer subtrees)."""
        enc_p = params["encoder"]
        out = {"enc_prenet": params["enc_prenet"],
               "dec_emb": params["dec_emb"],
               "decoder": params["decoder"],
               "postnet": params["postnet"],
               "stacked": stack_layer_params(
                   [enc_p[f"layer_{i}"] for i in range(L)])}
        if "layernorm" in enc_p:
            out["layernorm"] = enc_p["layernorm"]
        if "posenc" in enc_p:
            out["posenc"] = enc_p["posenc"]
        if "ctc_head" in params:
            out["ctc_head"] = params["ctc_head"]
        return out

    def param_specs_of(p):
        return {
            k: (jax.tree_util.tree_map(
                lambda l: P(*((axis,) + (None,) * (l.ndim - 1))), v)
                if k == "stacked"
                else jax.tree_util.tree_map(lambda l: P(), v))
            for k, v in p.items()}

    bspec = P(data_axis) if data_axis else P()

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        epoch = batch.get("epoch", jnp.zeros((), jnp.int32))
        group_ids = batch.get("group_ids")
        fn_cfg = getattr(c, "feat_norm", None)
        if group_ids is None and fn_cfg is not None \
                and fn_cfg.norm_type == "group":
            group_ids = batch.get("spk_ids")
        # group_ids may be None — a None operand is a leafless pytree, so
        # its bspec spec is a valid tree prefix and the frontend sees the
        # same None the sequential step would (train/state.py:70-74)

        def loss_fn(params):
            grouped = regroup(params)
            mut_spec = jax.tree_util.tree_map(lambda _: P(), state.mutables)
            smapped = jax.shard_map(
                forward, mesh=mesh,
                in_specs=(param_specs_of(grouped), mut_spec, bspec, bspec,
                          bspec, bspec, bspec, P(), P()),
                out_specs=(P(), P(), P()), check_vma=False)
            loss, metrics, new_mut = smapped(
                grouped, state.mutables, batch["feat"], batch["feat_len"],
                batch["text"], batch["text_len"], group_ids, epoch, rng)
            return loss, (metrics, new_mut)

        if train:
            grads, (metrics, new_mut) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(state.step + 1, params, new_opt,
                               {**state.mutables, **new_mut})
        else:
            _, (metrics, _) = loss_fn(state.params)
        return state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
