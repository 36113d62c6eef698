"""CTC prefix scorer (Watanabe Algorithm 2) as two lax.scans.

Rebuild of reference ``infer_func/ctc_decoding.py:6-196`` (ESPnet-style
batched prefix scoring). Math is identical; the implementation differs to be
TPU-shaped:

- the reference materializes the full lattice r of shape (T, 2, B*K, V)
  every step (ctc_decoding.py:92-120). Here the candidate-scoring pass is a
  scan over frames carrying only (BK, V) slabs (psi accumulates online), and
  the lattice for the *chosen* tokens is rebuilt by a second O(T*BK) scan —
  memory drops from O(T*BK*V) to O(BK*V).
- the reference's dynamic `start = max(1, prefix_len)` short-cut is replaced
  by a uniform scan from t=1: for t < prefix_len the lattice values are
  -inf by construction (a prefix of length L cannot end before frame L-1),
  so the uniform recursion yields identical results.

State per decode step: r (T, 2, BK) for the current prefixes, psi (BK,)
prefix scores, last_token (BK,). Scores returned are psi(h) - psi(g), the
incremental CTC log-prob, exactly like forward_step (ctc_decoding.py:130).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
NEG_INF = -1e20


class CTCScorerState(NamedTuple):
    r: Array            # (T, 2, BK) lattice of the current prefixes
    psi: Array          # (BK,) log P_ctc(prefix)
    last_token: Array   # (BK,) last non-blank token of each prefix
    prefix_len: Array   # () current prefix length (tokens after <sos>)


class CTCPrefixScorer:
    """Batched prefix scorer over (batch*beam) rows.

    x_logp: (B, T, V) log-softmax CTC outputs; rows are repeated over beams
    lazily via index arithmetic (no (BK, T, V) copy).
    """

    def __init__(self, x_logp: Array, enc_len: Array, beam_size: int,
                 blank_id: int = 0, eos_id: int = None):
        B, T, V = x_logp.shape
        self.B, self.T, self.V, self.K = B, T, V, beam_size
        self.blank_id = blank_id
        self.eos_id = V - 1 if eos_id is None else eos_id
        # mask frames beyond enc_len: all tokens -inf except blank = 0
        t_pos = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
        valid = t_pos < enc_len[:, None, None]
        x = jnp.where(valid, x_logp, NEG_INF)
        blank_col = jnp.where(valid[..., 0], x_logp[..., blank_id], 0.0)
        x = x.at[..., blank_id].set(blank_col)
        self.row = jnp.repeat(jnp.arange(B), beam_size)       # (BK,) -> batch
        self.x = x                                            # (B, T, V)
        self.x_blank = x[..., blank_id]                       # (B, T)
        self.enc_len = enc_len

    def init_state(self) -> CTCScorerState:
        BK, T = self.B * self.K, self.T
        # empty prefix: r_b[t] = cumsum of blank log-probs, r_nb = -inf
        rb = jnp.cumsum(self.x_blank, axis=1)                 # (B, T)
        rb = rb[self.row].T                                   # (T, BK)
        r = jnp.stack([jnp.full((T, BK), NEG_INF), rb], axis=1)
        return CTCScorerState(
            r=r, psi=jnp.zeros((BK,)),
            last_token=jnp.full((BK,), -1, jnp.int32),
            prefix_len=jnp.zeros((), jnp.int32))

    def score(self, state: CTCScorerState) -> Array:
        """Return (BK, V) incremental scores psi(g+c) - psi(g)."""
        BK, T, V = self.B * self.K, self.T, self.V
        x_nb = self.x[self.row]                               # (BK, T, V)
        x_b = self.x_blank[self.row]                          # (BK, T)
        r_prev = state.r                                      # (T, 2, BK)
        r_sum = jnp.logaddexp(r_prev[:, 0], r_prev[:, 1])     # (T, BK)
        onehot_last = jax.nn.one_hot(state.last_token, V, dtype=bool)

        empty = state.prefix_len == 0
        r_nb0 = jnp.where(empty, x_nb[:, 0, :], NEG_INF)      # (BK, V)
        r_b0 = jnp.full((BK, V), NEG_INF)
        start = jnp.maximum(state.prefix_len, 1)

        def phi_at(t):
            # phi[t, i, v] = r_sum[t, i], except v == last_token -> r_b
            return jnp.where(onehot_last, r_prev[t, 1][:, None],
                             r_sum[t][:, None])               # (BK, V)

        def body(carry, t):
            r_nb_p, r_b_p, psi_acc, psi_init = carry
            phi_p = phi_at(t - 1)
            x_t = x_nb[:, t, :]
            r_nb = jnp.logaddexp(r_nb_p, phi_p) + x_t
            r_b = jnp.logaddexp(r_nb_p, r_b_p) + x_b[:, t][:, None]
            psi_acc = jnp.logaddexp(psi_acc, phi_p + x_t)
            # capture r_nb at frame start-1 for the psi_init term
            psi_init = jnp.where(t - 1 == start - 1, r_nb_p, psi_init)
            return (r_nb, r_b, psi_acc, psi_init), None

        init = (r_nb0, r_b0, jnp.full((BK, V), NEG_INF),
                jnp.where(start - 1 == 0, r_nb0, jnp.full((BK, V), NEG_INF)))
        (r_nb_T, r_b_T, psi_acc, psi_init), _ = jax.lax.scan(
            body, init, jnp.arange(1, T))
        psi = jnp.logaddexp(psi_acc, psi_init)                # (BK, V)

        # eos column: total prefix probability r_sum at the last valid frame
        last_idx = self.enc_len[self.row] - 1                 # (BK,)
        prefix_total = r_sum[last_idx, jnp.arange(BK)]        # (BK,)
        psi = psi.at[:, self.eos_id].set(prefix_total)
        psi = psi.at[:, self.blank_id].set(NEG_INF)
        return psi - state.psi[:, None]

    def update_state(self, state: CTCScorerState, psi_scores: Array,
                     beam_idx: Array, token_idx: Array) -> CTCScorerState:
        """Advance to the chosen candidates (permute_mem parity,
        ctc_decoding.py:159-196): reindex by ``beam_idx`` (BK,), extend each
        prefix with ``token_idx`` (BK,), and rebuild the (T, 2, BK) lattice
        for the new prefixes with a cheap O(T*BK) scan."""
        BK, T = self.B * self.K, self.T
        r_old = state.r[:, :, beam_idx]                       # (T, 2, BK)
        last_old = state.last_token[beam_idx]
        psi_old = state.psi[beam_idx]
        row = self.row  # row[i] unchanged by in-batch beam permutation

        r_sum_old = jnp.logaddexp(r_old[:, 0], r_old[:, 1])   # (T, BK)
        bi = jnp.arange(BK)
        x_tok = self.x[row[:, None], jnp.arange(T)[None, :], token_idx[:, None]]
        x_tok = x_tok.T                                       # (T, BK)
        x_b = self.x_blank[row].T                             # (T, BK)
        is_rep = token_idx == last_old                        # (BK,)

        new_len = state.prefix_len + 1
        r_nb0 = jnp.where(new_len == 1, x_tok[0], NEG_INF)    # (BK,)
        r_b0 = jnp.full((BK,), NEG_INF)

        def body(carry, t):
            r_nb_p, r_b_p = carry
            phi_p = jnp.where(is_rep, r_old[t - 1, 1], r_sum_old[t - 1])
            r_nb = jnp.logaddexp(r_nb_p, phi_p) + x_tok[t]
            r_b = jnp.logaddexp(r_nb_p, r_b_p) + x_b[t]
            return (r_nb, r_b), (r_nb, r_b)

        (_, _), (r_nb_seq, r_b_seq) = jax.lax.scan(
            body, (r_nb0, r_b0), jnp.arange(1, T))
        r_nb = jnp.concatenate([r_nb0[None], r_nb_seq], 0)    # (T, BK)
        r_b = jnp.concatenate([r_b0[None], r_b_seq], 0)
        r_new = jnp.stack([r_nb, r_b], axis=1)                # (T, 2, BK)

        psi_new = psi_old + psi_scores[beam_idx, token_idx]
        return CTCScorerState(r=r_new, psi=psi_new, last_token=token_idx,
                              prefix_len=new_len)
