"""ASR inference drivers: KV-cached beam search / greedy decode over an
ARASRNet, with optional CTC prefix fusion, external-LM shallow fusion and
internal-LM subtraction.

Rebuild of reference ``model/ar_asr.py:729-921`` (inference entry) glued to
``infer_func/beam_search.py`` semantics — see infer/beam_search.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from speechain_tpu.infer.beam_search import StepScorer, beam_search
from speechain_tpu.infer.ctc_scorer import CTCPrefixScorer

Array = jnp.ndarray
NEG_INF = -1e20


def _repeat_rows(x: Array, k: int) -> Array:
    """(B, ...) -> (B*k, ...) with each row repeated k times
    (beam_search.py:235-250)."""
    return jnp.repeat(x, k, axis=0)


def asr_beam_search(
    net,
    variables: Dict[str, Any],
    feat: Array,
    feat_len: Array,
    *,
    beam_size: int = 4,
    min_f2t_ratio: float = 3.0,
    length_penalty: float = 1.0,
    temperature: float = 1.0,
    eos_filtering: bool = False,
    eos_threshold: float = 1.5,
    ctc_weight: float = 0.0,
    ctc_temperature: float = 1.0,
    lm_net=None,
    lm_variables: Optional[Dict[str, Any]] = None,
    lm_weight: float = 0.0,
    lm_temperature: float = 1.0,
    lm_window_size: Optional[int] = None,
    ilm_sub_weight: float = 0.0,
    sent_per_beam: int = 1,
    sos_eos: Optional[int] = None,
    padding_idx: int = 0,
    max_len: Optional[int] = None,
    group_ids: Optional[Array] = None,
) -> Dict[str, Array]:
    """Full inference: encoder pass + batched beam search.

    ``group_ids`` selects the per-group feature-normalization statistics
    (speaker/domain) at test time, matching training-side group norm
    (module/norm/feat_norm.py group granularity); unseen groups fall back
    to the all-group average inside apply_feat_norm."""
    cfg = net.cfg
    V = cfg.vocab_size
    sos_eos = V - 1 if sos_eos is None else sos_eos
    B = feat.shape[0]
    K = beam_size
    BK = B * K

    base_vars = {k: v for k, v in variables.items() if k != "cache"}

    # ---- encoder pass (runs once, full batch) --------------------------
    enc_feat, enc_feat_len, enc_mask, _ = net.apply(
        base_vars, feat, feat_len, train=False, group_ids=group_ids,
        method=net.encode)
    T_enc = enc_feat.shape[1]

    enc_rep = _repeat_rows(enc_feat, K)
    mask_rep = _repeat_rows(enc_mask, K)

    maxlen = max_len if max_len is not None else (
        int(T_enc / min_f2t_ratio) if min_f2t_ratio > 0
        else int(-min_f2t_ratio))
    maxlen = max(maxlen, 2)

    # ---- prime the decoder KV cache ------------------------------------
    dummy = jnp.full((BK, 1), sos_eos, jnp.int32)
    _, primed = net.apply(
        base_vars, dummy, enc_rep, mask_rep, prime=True,
        cache_capacity=maxlen, method=net.decode_step, mutable=["cache"])
    asr_cache = primed["cache"]

    def asr_step(cache, token):
        logits, updated = net.apply(
            {**base_vars, "cache": cache}, token, enc_rep, mask_rep,
            method=net.decode_step, mutable=["cache"])
        return logits, updated["cache"]

    # ---- CTC prefix scorer ---------------------------------------------
    ctc_scorer = None
    if ctc_weight > 0.0 and cfg.ctc_weight > 0.0:
        ctc_logits = net.apply(base_vars, enc_feat, method=net.ctc_logits)
        ctc_logits = ctc_logits.at[:, :, sos_eos].set(NEG_INF)
        ctc_logp = jax.nn.log_softmax(
            ctc_logits.astype(jnp.float32) / ctc_temperature, -1)
        ctc_scorer = CTCPrefixScorer(ctc_logp, enc_feat_len, K,
                                     blank_id=padding_idx, eos_id=sos_eos)

    # ---- external LM ----------------------------------------------------
    lm = None
    if lm_net is not None and lm_weight > 0.0:
        lm_base = {k: v for k, v in lm_variables.items() if k != "cache"}
        if lm_window_size:
            # sliding-window fusion (reference beam_search.py:321-339):
            # full LM forward over the last W prefix tokens each step
            def lm_window_fwd(tokens, lens):
                return lm_net.apply(lm_base, tokens, lens)[0]

            lm = StepScorer(step=lm_window_fwd, cache=None,
                            weight=lm_weight, temperature=lm_temperature,
                            window_size=int(lm_window_size))
        else:
            _, lm_primed = lm_net.apply(
                lm_base, dummy, prime=True, cache_capacity=maxlen,
                method=lm_net.decode_step, mutable=["cache"])

            def lm_step(cache, token):
                logits, updated = lm_net.apply(
                    {**lm_base, "cache": cache}, token,
                    method=lm_net.decode_step, mutable=["cache"])
                return logits, updated["cache"]

            lm = StepScorer(step=lm_step, cache=lm_primed["cache"],
                            weight=lm_weight, temperature=lm_temperature)

    # ---- internal LM (decoder over zeroed encoder output) ---------------
    ilm = None
    if ilm_sub_weight > 0.0:
        zero_enc = jnp.zeros_like(enc_rep)
        ones_mask = jnp.ones((BK, 1, 1), bool)
        _, ilm_primed = net.apply(
            base_vars, dummy, zero_enc[:, :1], ones_mask, prime=True,
            cache_capacity=maxlen, method=net.decode_step, mutable=["cache"])

        def ilm_step(cache, token):
            logits, updated = net.apply(
                {**base_vars, "cache": cache}, token, zero_enc[:, :1],
                ones_mask, method=net.decode_step, mutable=["cache"])
            return logits, updated["cache"]

        ilm = StepScorer(step=ilm_step, cache=ilm_primed["cache"],
                         weight=ilm_sub_weight, temperature=1.0)

    out = beam_search(
        asr_step, asr_cache, T_enc, enc_feat_len, B, V, sos_eos,
        padding_idx=padding_idx, beam_size=K,
        min_f2t_ratio=min_f2t_ratio, length_penalty=length_penalty,
        temperature=temperature, eos_filtering=eos_filtering,
        eos_threshold=eos_threshold, ctc_weight=ctc_weight,
        ctc_scorer=ctc_scorer, lm=lm, ilm=ilm, max_len=max_len,
        sent_per_beam=sent_per_beam)
    return out


def asr_greedy_decode(net, variables, feat, feat_len, **kw):
    """Greedy = beam size 1 (teacher-free)."""
    return asr_beam_search(net, variables, feat, feat_len, beam_size=1, **kw)


def make_asr_decoder(net, **decode_kwargs):
    """Return a JITTED ``fn(variables, feat, feat_len) -> results``.

    ``asr_beam_search`` called directly executes its ``lax.while_loop``
    eagerly (one device dispatch per op per step — catastrophic through a
    remote TPU tunnel); wrapping the whole search in ``jax.jit`` compiles
    the loop into a single executable. Measured on v5e: 9.7 s -> one
    compiled program per (batch-shape, config) pair.
    """
    import jax

    from speechain_tpu.infer.quantize import dequantize_variables

    @jax.jit
    def decode(variables, feat, feat_len, group_ids=None):
        # identity on float trees; reconstructs int8-quantized weights
        # in-executable (infer/quantize.py — infer_cfg: weight_quant)
        variables = dequantize_variables(variables)
        return asr_beam_search(net, variables, feat, feat_len,
                               group_ids=group_ids, **decode_kwargs)

    return decode


def make_asr_teacher_scorer(net, **kwargs):
    """JITTED ``fn(variables, feat, feat_len, text, text_len)`` wrapping
    :func:`asr_teacher_forcing` (same rationale as make_asr_decoder)."""
    import jax as _jax

    from speechain_tpu.infer.quantize import dequantize_variables

    @_jax.jit
    def score(variables, feat, feat_len, text, text_len):
        variables = dequantize_variables(variables)
        return asr_teacher_forcing(net, variables, feat, feat_len, text,
                                   text_len, **kwargs)

    return score


def asr_teacher_forcing(net, variables, feat: Array, feat_len: Array,
                        text: Array, text_len: Array, *,
                        temperature: float = 1.0) -> Dict[str, Array]:
    """Teacher-forced scoring pass (model/ar_asr.py:874-921): run the decoder
    on the ground-truth text and report per-utterance confidence
    (length-normalized sum of target-token log-probs) and the
    feature-to-token length ratio — the chain recipes use these to filter
    pseudo-labeled data."""
    base = {k: v for k, v in variables.items() if k != "cache"}
    enc_feat, enc_feat_len, enc_mask, _ = net.apply(
        base, feat, feat_len, train=False, method=net.encode)
    logits, *_ = net.apply(base, enc_feat, enc_mask, text, text_len,
                           method=net.decode)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature, -1)
    tgt = text[:, 1:]
    lp = jnp.take_along_axis(logp[:, :tgt.shape[1]], tgt[..., None],
                             -1)[..., 0]
    L = tgt.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    mask = pos < (text_len - 1)[:, None]
    lp = jnp.where(mask, lp, 0.0)
    n = jnp.maximum((text_len - 1).astype(jnp.float32), 1.0)
    confid = jnp.sum(lp, -1) / n
    hypo = jnp.argmax(logits, -1)
    hypo = jnp.where(mask, hypo, 0)
    return dict(
        hypo_text=hypo,
        hypo_text_len=jnp.maximum(text_len - 2, 0),
        hypo_text_confid=confid,
        feat_token_len_ratio=enc_feat_len.astype(jnp.float32)
        / (jnp.maximum(text_len - 2, 1).astype(jnp.float32)),
    )
