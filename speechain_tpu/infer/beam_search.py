"""Batched beam search with KV caches, CTC prefix fusion, shallow LM fusion
and internal-LM subtraction.

Rebuild of reference ``infer_func/beam_search.py:106-550`` with identical
decoding semantics but TPU-native execution:

- the reference recomputes the full prefix through the decoder every step
  with a Python loop over candidates (beam_search.py:299-306, 346-474); here
  one ``lax.while_loop`` advances KV-cached single-step decoders and all
  candidate selection is vectorized top-k.
- per-sentence hypothesis containers (BeamHypotheses, :21-103) become a
  fixed (B, K) finished pool updated by masked top-k.

Semantics preserved (verified against the reference source):
- scores: log_softmax(logits / temperature); CTC fusion
  (1-w)*att + w*ctc with blank masked (:310-318); LM fusion + w*lm
  (:321-339); ILM subtraction - w_ilm*ilm (:342-373).
- top-2K candidate selection; an <eos> candidate is only eligible if its
  rank < K (:360-366) and, with eos_filtering, if its log-prob exceeds
  eos_threshold * max over other tokens (:364-371).
- finished score = sum_logprobs / (hyp_len + eps)^length_penalty (:60-64),
  hyp_len excluding <sos>/<eos>.
- a sentence is done when its pool has K hyps and the best current
  raw score normalized by the current length cannot beat the worst pool
  entry (:73-103).
- unfinished sentences at maxlen contribute their alive beams (:418-426).
- maxlen = enc_T / min_f2t_ratio (>0: relative) or -min_f2t_ratio (:227).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from speechain_tpu.infer.ctc_scorer import CTCPrefixScorer, CTCScorerState

Array = jnp.ndarray
NEG_INF = -1e20
EPS = 1e-20


@dataclasses.dataclass
class StepScorer:
    """A KV-cached autoregressive scorer: step(cache, token (BK,1)) ->
    (logits (BK, 1, V), new_cache).

    When ``window_size > 0`` the scorer is windowed instead (the reference's
    ``lm_window_size`` sliding-window LM fusion, beam_search.py:321-339):
    ``step(tokens (BK, W), lens (BK,)) -> logits (BK, W, V)`` re-scores the
    last W prefix tokens from position 0 each beam step and ``cache`` is
    unused (None)."""

    step: Callable
    cache: Any
    weight: float = 0.0
    temperature: float = 1.0
    window_size: int = 0


class BeamState(NamedTuple):
    cur_len: Array          # () tokens generated so far per alive beam
    alive_seq: Array        # (B, K, L) generated tokens (no sos)
    alive_score: Array      # (B, K) cumulative raw log-prob
    last_token: Array       # (B, K) last generated token (sos at start)
    fin_seq: Array          # (B, K, L)
    fin_score: Array        # (B, K) normalized scores, -inf when empty
    fin_len: Array          # (B, K)
    done: Array             # (B,)
    asr_cache: Any
    lm_cache: Any
    ilm_cache: Any
    ctc_state: Any


def _gather_cache(cache, beam_idx: Array, bk: int):
    """Reindex every (BK, ...) cache leaf by the flat beam index.

    Cross-attention K/V leaves are skipped: the beam reorder stays within
    each utterance's K-beam block and every row of that block holds the
    SAME projected encoder K/V (written once at priming from the
    K-repeated encoder output), so gathering them is a content identity —
    and they dominate the per-step HBM traffic of the search
    ((BK, H, T_enc, Dh) x 2 x layers read+written every step).
    """
    def g(path, leaf):
        names = "/".join(str(p) for p in path)
        if "cached_cross" in names:
            return leaf
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == bk:
            return leaf[beam_idx]
        return leaf
    return jax.tree_util.tree_map_with_path(g, cache)


def beam_search(
    asr_step: Callable,            # (cache, token (BK,1)) -> (logits, cache)
    asr_cache: Any,
    enc_T: int,
    enc_len: Array,                # (B,) true encoder lengths
    batch_size: int,
    vocab_size: int,
    sos_eos: int,
    *,
    padding_idx: int = 0,
    beam_size: int = 4,
    min_f2t_ratio: float = 3.0,
    length_penalty: float = 1.0,
    temperature: float = 1.0,
    eos_filtering: bool = False,
    eos_threshold: float = 1.5,
    ctc_weight: float = 0.0,
    ctc_scorer: Optional[CTCPrefixScorer] = None,
    lm: Optional[StepScorer] = None,
    ilm: Optional[StepScorer] = None,
    max_len: Optional[int] = None,
    sent_per_beam: int = 1,
) -> Dict[str, Array]:
    B, K, V = batch_size, beam_size, vocab_size
    BK = B * K
    maxlen = max_len if max_len is not None else (
        int(enc_T / min_f2t_ratio) if min_f2t_ratio > 0
        else int(-min_f2t_ratio))
    maxlen = max(maxlen, 2)
    L = maxlen  # token buffer capacity

    init = BeamState(
        cur_len=jnp.zeros((), jnp.int32),
        alive_seq=jnp.full((B, K, L), padding_idx, jnp.int32),
        alive_score=jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (B, K), 1) == 0, 0.0,
            NEG_INF),
        last_token=jnp.full((B, K), sos_eos, jnp.int32),
        fin_seq=jnp.full((B, K, L), padding_idx, jnp.int32),
        fin_score=jnp.full((B, K), NEG_INF),
        fin_len=jnp.zeros((B, K), jnp.int32),
        done=jnp.zeros((B,), bool),
        asr_cache=asr_cache,
        lm_cache=lm.cache if lm is not None else None,
        ilm_cache=ilm.cache if ilm is not None else None,
        ctc_state=ctc_scorer.init_state() if ctc_scorer is not None else None,
    )

    def cond(s: BeamState):
        return (s.cur_len < maxlen - 1) & ~jnp.all(s.done)

    def body(s: BeamState) -> BeamState:
        tok_in = s.last_token.reshape(BK, 1)
        logits, asr_cache = asr_step(s.asr_cache, tok_in)
        logp = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32) / temperature, -1)  # (BK, V)
        att_logp = logp

        ctc_state = s.ctc_state
        if ctc_scorer is not None and ctc_weight > 0.0:
            logp = logp.at[:, padding_idx].set(NEG_INF)
            ctc_inc = ctc_scorer.score(ctc_state)                # (BK, V)
            logp = (1.0 - ctc_weight) * logp + ctc_weight * ctc_inc

        lm_cache = s.lm_cache
        if lm is not None and lm.weight > 0.0:
            if lm.window_size > 0:
                # sliding-window LM fusion (reference beam_search.py:321-339):
                # rerun the LM on the last W tokens of [sos] + prefix, with
                # positions restarting at 0 — no KV cache. Shorter prefixes
                # keep their true length; the causal mask makes the trailing
                # slack positions invisible to the scored position.
                W = min(lm.window_size, L + 1)
                seqs = s.alive_seq.reshape(BK, L)
                full = jnp.concatenate(
                    [jnp.full((BK, 1), sos_eos, jnp.int32), seqs], axis=1)
                plen = s.cur_len + 1          # prefix length incl. sos
                start = jnp.maximum(0, plen - W)
                win = jax.lax.dynamic_slice_in_dim(full, start, W, axis=1)
                wlen = jnp.broadcast_to(jnp.minimum(plen, W), (BK,))
                lm_logits = lm.step(win, wlen)               # (BK, W, V)
                pos_logits = jnp.take_along_axis(
                    lm_logits, (wlen - 1)[:, None, None], axis=1)[:, 0]
                lm_logp = jax.nn.log_softmax(
                    pos_logits.astype(jnp.float32) / lm.temperature, -1)
            else:
                lm_logits, lm_cache = lm.step(lm_cache, tok_in)
                lm_logp = jax.nn.log_softmax(
                    lm_logits[:, -1].astype(jnp.float32) / lm.temperature,
                    -1)
            logp = logp + lm.weight * lm_logp

        ilm_cache = s.ilm_cache
        if ilm is not None and ilm.weight > 0.0:
            ilm_logits, ilm_cache = ilm.step(ilm_cache, tok_in)
            ilm_logp = jax.nn.log_softmax(
                ilm_logits[:, -1].astype(jnp.float32), -1)
            logp = logp - ilm.weight * ilm_logp

        cand = s.alive_score.reshape(BK, 1) + logp               # (BK, V)
        cand = cand.reshape(B, K * V)
        top_score, top_idx = jax.lax.top_k(cand, 2 * K)          # (B, 2K)
        top_beam = top_idx // V                                  # local beam
        top_token = top_idx % V

        is_eos = top_token == sos_eos
        rank = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * K), 1)
        eos_ok = is_eos & (rank < K) & ~s.done[:, None]
        if eos_filtering:
            # eos eligible only if its score beats thr * best other token
            # (per source beam, pre-fusion semantics use the fused logp here
            # like the reference's next_token_scores)
            no_eos = logp.at[:, sos_eos].set(NEG_INF)
            ref_best = jnp.max(no_eos, axis=-1).reshape(B, K)    # (B, K)
            eos_sc = logp[:, sos_eos].reshape(B, K)
            pass_filter = eos_sc > eos_threshold * ref_best      # (B, K)
            eos_ok = eos_ok & jnp.take_along_axis(pass_filter, top_beam, 1)

        # ---- finished pool update -------------------------------------
        hyp_len = s.cur_len  # tokens in hyp when eos fires now
        eos_norm = top_score / ((hyp_len.astype(jnp.float32) + EPS)
                                ** length_penalty)
        eos_norm = jnp.where(eos_ok, eos_norm, NEG_INF)          # (B, 2K)
        # candidate sequences = current alive prefix of the source beam
        flat_beam = (jax.lax.broadcasted_iota(jnp.int32, (B, 2 * K), 0) * K
                     + top_beam).reshape(-1)
        cand_seq = s.alive_seq.reshape(BK, L)[flat_beam].reshape(B, 2 * K, L)
        pool_scores = jnp.concatenate([s.fin_score, eos_norm], 1)  # (B, 3K)
        pool_seqs = jnp.concatenate([s.fin_seq, cand_seq], 1)
        pool_lens = jnp.concatenate(
            [s.fin_len, jnp.broadcast_to(hyp_len, (B, 2 * K))], 1)
        new_fin_score, sel = jax.lax.top_k(pool_scores, K)       # (B, K)
        new_fin_seq = jnp.take_along_axis(pool_seqs, sel[..., None], 1)
        new_fin_len = jnp.take_along_axis(pool_lens, sel, 1)
        # frozen sentences keep their pool untouched
        keep = s.done[:, None]
        new_fin_score = jnp.where(keep, s.fin_score, new_fin_score)
        new_fin_seq = jnp.where(keep[..., None], s.fin_seq, new_fin_seq)
        new_fin_len = jnp.where(keep, s.fin_len, new_fin_len)

        # ---- alive beams: first K non-eos candidates in rank order ----
        alive_cand_score = jnp.where(is_eos, NEG_INF, top_score)
        a_score, a_sel = jax.lax.top_k(alive_cand_score, K)      # (B, K)
        a_beam = jnp.take_along_axis(top_beam, a_sel, 1)
        a_token = jnp.take_along_axis(top_token, a_sel, 1)
        beam_idx = (jax.lax.broadcasted_iota(jnp.int32, (B, K), 0) * K
                    + a_beam).reshape(-1)                        # (BK,)
        new_alive_seq = s.alive_seq.reshape(BK, L)[beam_idx].reshape(B, K, L)
        new_alive_seq = jax.lax.dynamic_update_slice(
            new_alive_seq, a_token[:, :, None],
            (0, 0, s.cur_len))
        # frozen sentences: stop advancing their state
        freeze = s.done[:, None]
        new_alive_seq = jnp.where(freeze[..., None], s.alive_seq,
                                  new_alive_seq)
        a_score = jnp.where(freeze, s.alive_score, a_score)
        a_token = jnp.where(freeze, s.last_token, a_token)
        identity_idx = (jax.lax.broadcasted_iota(jnp.int32, (B, K), 0) * K
                        + jax.lax.broadcasted_iota(jnp.int32, (B, K), 1))
        beam_idx = jnp.where(freeze, identity_idx,
                             beam_idx.reshape(B, K)).reshape(-1)

        asr_cache = _gather_cache(asr_cache, beam_idx, BK)
        if lm is not None:
            lm_cache = _gather_cache(lm_cache, beam_idx, BK)
        if ilm is not None:
            ilm_cache = _gather_cache(ilm_cache, beam_idx, BK)
        if ctc_scorer is not None and ctc_weight > 0.0:
            ctc_state = ctc_scorer.update_state(
                ctc_state, ctc_inc, beam_idx, a_token.reshape(-1))

        # ---- done condition (is_done, :73-103) ------------------------
        pool_full = jnp.sum(new_fin_score > NEG_INF / 2, 1) >= K
        best_raw = jnp.max(top_score, 1)
        cur_norm = best_raw / ((s.cur_len.astype(jnp.float32) + EPS)
                               ** length_penalty)
        new_done = s.done | (pool_full &
                             (cur_norm < jnp.min(new_fin_score, 1)))

        return BeamState(
            cur_len=s.cur_len + 1, alive_seq=new_alive_seq,
            alive_score=a_score, last_token=a_token,
            fin_seq=new_fin_seq, fin_score=new_fin_score,
            fin_len=new_fin_len, done=new_done, asr_cache=asr_cache,
            lm_cache=lm_cache, ilm_cache=ilm_cache, ctc_state=ctc_state)

    final = jax.lax.while_loop(cond, body, init)

    # unfinished sentences: pool their alive beams (:418-426)
    alive_norm = final.alive_score / (
        (final.cur_len.astype(jnp.float32) + EPS) ** length_penalty)
    alive_norm = jnp.where(final.done[:, None], NEG_INF, alive_norm)
    pool_scores = jnp.concatenate([final.fin_score, alive_norm], 1)
    pool_seqs = jnp.concatenate([final.fin_seq, final.alive_seq], 1)
    pool_lens = jnp.concatenate(
        [final.fin_len,
         jnp.broadcast_to(final.cur_len, (B, K))], 1)
    # n-best selection: the finished pool already holds K scored hypotheses
    # per utterance, so sent_per_beam > 1 (NotImplementedError in the
    # reference, beam_search.py:190-200) falls out for free.
    N = max(1, min(sent_per_beam, pool_scores.shape[1]))
    best_score, best = jax.lax.top_k(pool_scores, N)             # (B, N)
    hypo = jnp.take_along_axis(pool_seqs, best[..., None], 1)    # (B, N, L)
    hypo_len = jnp.take_along_axis(pool_lens, best, 1)           # (B, N)
    # zero out tokens beyond each hypothesis length
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    hypo = jnp.where(pos < hypo_len[..., None], hypo, padding_idx)

    out = dict(
        hypo_text=hypo[:, 0],
        hypo_text_len=hypo_len[:, 0],
        hypo_text_confid=best_score[:, 0],
        feat_token_len_ratio=enc_len.astype(jnp.float32)
        / (hypo_len[:, 0].astype(jnp.float32) + 1e-10),
    )
    if N > 1:
        out.update(nbest_text=hypo, nbest_text_len=hypo_len,
                   nbest_confid=best_score)
    return out
