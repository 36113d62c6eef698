"""Frame-synchronous CTC prefix beam search — streaming first-pass decoder.

The reference decodes CTC only as a prefix *scorer* fused into its
label-synchronous attention beam search (``infer_func/ctc_decoding.py``,
``beam_search.py:299-474``), which requires the full utterance up front.
This module is the frame-synchronous counterpart (Hannun et al. 2014,
"First-Pass Large Vocabulary Continuous Speech Recognition using
Bi-Directional Recurrent DNNs"): hypotheses advance one encoder frame at a
time, so the beam can ride a *stream* — feed whatever frames exist, carry
the state, resume on the next chunk. It is the first pass of the two-pass
(CTC partials -> attention rescoring) serving stack in infer/streaming.py.

TPU-native design — everything is static-shaped and jittable:

- A hypothesis set is a ``PrefixBeamState`` pytree of (B, W) arrays; the
  per-frame update ``prefix_beam_update`` is a pure function suitable for
  ``lax.scan`` over frames (offline) or per-chunk scans (streaming).
- Each frame expands W beams into W * (1 + P) candidates (P = top-P vocab
  pruning of the frame posterior): one "stay" candidate (emit blank or
  repeat the last token — the prefix string is unchanged) and P extensions.
- The classic algorithm merges candidates that spell the same prefix with
  a hash map; here merging is vectorized: each prefix carries two
  independent 32-bit rolling hashes updated in O(1) per append, candidates
  are compared all-pairs ((W*(1+P))^2 booleans — tiny), scores of equal
  prefixes are log-sum-exp'd into the first (canonical) copy, duplicates
  are masked to -inf, and ``lax.top_k`` keeps the best W.
- Dead beams need no special casing: they carry the empty prefix at -inf
  and merge harmlessly into any live copy of the same prefix.

Blank id is 0 (train/criteria.py CTC convention).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
NEG_INF = -1e30
# independent odd multipliers for the two rolling hashes (Knuth / xorshift
# flavored; exactness only needs them to disagree on collisions)
_H1_MUL = np.uint32(2654435761)
_H2_MUL = np.uint32(40503)
_H1_INIT = np.uint32(2166136261)
_H2_INIT = np.uint32(5381)


class PrefixBeamState(NamedTuple):
    """W prefix hypotheses per batch row; all arrays lead with (B, W)."""

    tokens: Array   # (B, W, Lmax) int32, zero-padded
    length: Array   # (B, W) int32 — tokens in the prefix
    p_b: Array      # (B, W) f32 log P(prefix, last frame = blank)
    p_nb: Array     # (B, W) f32 log P(prefix, last frame = non-blank)
    last: Array     # (B, W) int32 last token (0 when empty)
    h1: Array       # (B, W) uint32 rolling hash 1
    h2: Array       # (B, W) uint32 rolling hash 2


def prefix_beam_init(batch: int, beam_size: int, max_len: int
                     ) -> PrefixBeamState:
    """All beams hold the empty prefix; only beam 0 is live (log-prob 0)."""
    B, W = batch, beam_size
    p_b = jnp.full((B, W), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    return PrefixBeamState(
        tokens=jnp.zeros((B, W, max_len), jnp.int32),
        length=jnp.zeros((B, W), jnp.int32),
        p_b=p_b,
        p_nb=jnp.full((B, W), NEG_INF, jnp.float32),
        last=jnp.zeros((B, W), jnp.int32),
        h1=jnp.full((B, W), _H1_INIT, jnp.uint32),
        h2=jnp.full((B, W), _H2_INIT, jnp.uint32),
    )


def prefix_beam_update(state: PrefixBeamState, logp: Array,
                       valid: Optional[Array] = None,
                       prune: int = 8) -> PrefixBeamState:
    """Advance every row's beam by ONE encoder frame.

    logp: (B, V) log-softmax CTC frame posteriors (blank = column 0).
    valid: (B,) bool; rows with False keep their state bit-identically
    (streaming chunks are padded to a static frame count, and pool rows
    idle at their own cadence).
    prune: P, the per-frame top-P vocab shortlist for extensions.
    """
    B, W, Lmax = state.tokens.shape
    V = logp.shape[-1]
    P = min(prune, V - 1)
    C = W * (1 + P)

    lp_blank = logp[:, 0]                                     # (B,)
    # top-P non-blank tokens of this frame, shared by every beam of the row
    lp_tok, tok = jax.lax.top_k(
        jnp.concatenate([jnp.full((B, 1), NEG_INF), logp[:, 1:]], 1), P)
    tok = tok + 0  # indices into [pad, v1..] -> +0 maps col j to vocab j
    # top_k ran over [NEG_INF, logp[1:]]: column j of that array is vocab j
    # for j >= 1 and a -inf sentinel at j = 0, so indices ARE vocab ids
    # (the sentinel never wins while V > 1).

    lp_last = jnp.take_along_axis(logp, state.last, axis=1)  # (B, W)

    # ---- stay candidates: prefix unchanged ------------------------------
    stay_p_b = jnp.logaddexp(state.p_b, state.p_nb) + lp_blank[:, None]
    stay_p_nb = jnp.where(state.length > 0, state.p_nb + lp_last, NEG_INF)

    # ---- extension candidates: append v (per beam w, per shortlist p) ---
    v_tok = jnp.broadcast_to(tok[:, None, :], (B, W, P))      # (B, W, P)
    v_lp = jnp.broadcast_to(lp_tok[:, None, :], (B, W, P))
    is_rep = v_tok == state.last[:, :, None]                  # (B, W, P)
    base = jnp.where(is_rep, state.p_b[:, :, None],
                     jnp.logaddexp(state.p_b, state.p_nb)[:, :, None])
    ext_p_nb = base + v_lp                                    # (B, W, P)
    # a full prefix cannot grow
    ext_p_nb = jnp.where((state.length < Lmax)[:, :, None], ext_p_nb,
                         NEG_INF)

    # candidate tensors, flattened to (B, C)
    def flat(stay, ext):
        return jnp.concatenate(
            [stay[..., None], ext], axis=2).reshape(B, C)

    grow = jnp.concatenate([jnp.zeros((B, W, 1), bool),
                            jnp.ones((B, W, P), bool)], 2).reshape(B, C)
    cand_v = flat(jnp.zeros((B, W), jnp.int32), v_tok)        # appended tok
    cand_p_b = flat(stay_p_b, jnp.full((B, W, P), NEG_INF))
    cand_p_nb = flat(stay_p_nb, ext_p_nb)
    cand_len = flat(state.length, state.length[:, :, None] +
                    jnp.ones((B, W, P), jnp.int32))
    cand_last = flat(state.last, v_tok)
    parent = jnp.broadcast_to(
        jnp.arange(W)[None, :, None], (B, W, 1 + P)).reshape(B, C)

    vu = cand_v.astype(jnp.uint32) + jnp.uint32(1)
    h1p = state.h1[jnp.arange(B)[:, None], parent]
    h2p = state.h2[jnp.arange(B)[:, None], parent]
    cand_h1 = jnp.where(grow, h1p * _H1_MUL + vu, h1p)
    cand_h2 = jnp.where(grow, h2p * _H2_MUL + vu, h2p)

    # ---- merge candidates spelling the same prefix -----------------------
    same = (cand_h1[:, :, None] == cand_h1[:, None, :]) & \
           (cand_h2[:, :, None] == cand_h2[:, None, :]) & \
           (cand_len[:, :, None] == cand_len[:, None, :])     # (B, C, C)
    # canonical copy of a class = its first member
    canon = jnp.argmax(same, axis=1) == \
        jnp.arange(C)[None, :]                                # (B, C)

    def merge(scores):
        # logsumexp of each class into every member, keep only canonicals
        m = jnp.max(jnp.where(same, scores[:, :, None], NEG_INF), axis=1)
        s = jnp.sum(jnp.where(same, jnp.exp(scores[:, :, None] -
                                            m[:, None, :]), 0.0), axis=1)
        merged = m + jnp.log(s)
        return jnp.where(canon & (merged > NEG_INF / 2), merged, NEG_INF)

    m_p_b = merge(cand_p_b)
    m_p_nb = merge(cand_p_nb)

    # ---- select top W by total probability ------------------------------
    total = jnp.logaddexp(m_p_b, m_p_nb)
    _, sel = jax.lax.top_k(total, W)                          # (B, W)
    bi = jnp.arange(B)[:, None]
    sel_parent = parent[bi, sel]
    new_tokens = state.tokens[bi, sel_parent]                 # (B, W, Lmax)
    sel_grow = grow[bi, sel]
    sel_v = cand_v[bi, sel]
    sel_len_old = state.length[bi, sel_parent]
    put = (jnp.arange(Lmax)[None, None, :] == sel_len_old[:, :, None]) \
        & sel_grow[:, :, None]
    new_tokens = jnp.where(put, sel_v[:, :, None], new_tokens)

    new = PrefixBeamState(
        tokens=new_tokens,
        length=cand_len[bi, sel],
        p_b=m_p_b[bi, sel],
        p_nb=m_p_nb[bi, sel],
        last=cand_last[bi, sel],
        h1=cand_h1[bi, sel],
        h2=cand_h2[bi, sel],
    )
    if valid is None:
        return new
    keep = valid.reshape(B, *([1] * 0))                       # (B,)

    def pick(n, o):
        k = keep.reshape((B,) + (1,) * (n.ndim - 1))
        return jnp.where(k, n, o)

    return jax.tree_util.tree_map(pick, new, state)


def prefix_beam_scores(state: PrefixBeamState) -> Array:
    """(B, W) total log P_ctc of each prefix (beams come out of
    ``prefix_beam_update`` sorted best-first)."""
    return jnp.logaddexp(state.p_b, state.p_nb)


def ctc_prefix_beam_offline(logp: Array, lens: Array, *, beam_size: int,
                            prune: int = 8,
                            max_len: Optional[int] = None
                            ) -> Tuple[Array, Array, Array]:
    """Run the frame-synchronous beam over full utterances.

    logp: (B, T, V) log-softmax CTC posteriors; lens: (B,) valid frames.
    Returns (tokens (B, W, Lmax), length (B, W), scores (B, W)).
    """
    B, T, V = logp.shape
    Lmax = max_len if max_len is not None else T
    state = prefix_beam_init(B, beam_size, Lmax)

    def body(st, t):
        return prefix_beam_update(st, logp[:, t], valid=t < lens,
                                  prune=prune), None

    state, _ = jax.lax.scan(body, state, jnp.arange(T))
    return state.tokens, state.length, prefix_beam_scores(state)


# ---------------------------------------------------------------- oracle

def prefix_beam_oracle(logp: np.ndarray, T: int, beam_size: int,
                       prune: int) -> list:
    """Classic dict-based prefix beam search (numpy, one utterance) — the
    differential-test oracle for the vectorized implementation. Returns
    [(prefix tuple, total log-prob)] sorted best-first."""

    def lse(*xs):
        xs = [x for x in xs if x > NEG_INF / 2]
        if not xs:
            return NEG_INF
        m = max(xs)
        return m + np.log(sum(np.exp(x - m) for x in xs))

    beams = {(): (0.0, NEG_INF)}                    # prefix -> (p_b, p_nb)
    for t in range(T):
        frame = logp[t]
        order = np.argsort(frame[1:])[::-1][:prune] + 1
        nxt: dict = {}

        def add(pref, pb, pnb):
            opb, opnb = nxt.get(pref, (NEG_INF, NEG_INF))
            nxt[pref] = (lse(opb, pb), lse(opnb, pnb))

        for pref, (p_b, p_nb) in beams.items():
            total = lse(p_b, p_nb)
            add(pref, total + frame[0],
                p_nb + frame[pref[-1]] if pref else NEG_INF)
            for v in order:
                base = p_b if (pref and v == pref[-1]) else total
                add(pref + (int(v),), NEG_INF, base + frame[v])
        ranked = sorted(nxt.items(), key=lambda kv: -lse(*kv[1]))
        beams = dict(ranked[:beam_size])
    return sorted(((p, lse(*pb)) for p, pb in beams.items()),
                  key=lambda kv: -kv[1])
