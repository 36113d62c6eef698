"""CTC forced alignment: Viterbi over the CTC topology, one executable.

Gives the framework a NATIVE duration extractor: a model trained with
``ctc_weight > 0`` aligns (audio, transcript) pairs itself — per-token
frame spans and FastSpeech2-ready durations — replacing the reference's
external Montreal Forced Aligner round-trip (its TTS recipes shell out to
MFA and parse TextGrids back in; see
``pyscripts/duration_calculator.py`` for that parity path, reference
``datasets/pyscripts/duration_calculator.py:136``).

TPU shape discipline: the DP runs as one ``lax.scan`` over frames with a
static (B, S) state lattice (S = 2L+1 blank-interleaved states), int8
backpointers, and a reverse scan for the path — no data-dependent
shapes, so one compiled executable serves every batch of its shape
bucket.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

NEG_INF = -1e30


class CTCAlignment(NamedTuple):
    path: Array        # (B, T) int32: per-frame token index (blanks merged
    #                    into the preceding token; leading blanks -> 0)
    durations: Array   # (B, L) int32: frames per label token, summing to
    #                    logp_len per row (0 beyond label_len)
    score: Array       # (B,) float32: Viterbi log-prob of the alignment


def ctc_forced_align(logp: Array, labels: Array, logp_len: Array,
                     label_len: Array, blank: int = 0) -> CTCAlignment:
    """Most-likely CTC alignment of ``labels`` to ``logp``.

    logp: (B, T, V) log-softmax outputs; labels: (B, L) token ids WITHOUT
    blanks (padded rows arbitrary); logp_len/label_len: (B,) valid counts.
    The standard extended sequence z = [b, l1, b, l2, ..., lL, b] with the
    usual transitions (stay, advance 1, skip a blank when the two tokens
    around it differ); terminal = best of the last token / final blank.
    """
    B, T, V = logp.shape
    L = labels.shape[1]
    S = 2 * L + 1
    labels = labels.astype(jnp.int32)
    logp_len = jnp.asarray(logp_len, jnp.int32)
    label_len = jnp.asarray(label_len, jnp.int32)

    s_idx = jnp.arange(S)
    is_tok = (s_idx % 2) == 1                       # odd states emit tokens
    tok_of_s = jnp.clip((s_idx - 1) // 2, 0, L - 1)
    z = jnp.where(is_tok[None, :], jnp.take_along_axis(
        labels, jnp.broadcast_to(tok_of_s[None, :], (B, S)), axis=1),
        blank)                                       # (B, S) emitted symbol
    # states beyond this row's 2*label_len+1 lattice are dead
    alive = s_idx[None, :] < (2 * label_len[:, None] + 1)
    # skip transition s-2 -> s allowed for token states whose previous
    # token differs (z_s != z_{s-2}); never into blanks
    z_m2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :S]
    can_skip = is_tok[None, :] & (z != z_m2)

    emit = jnp.take_along_axis(
        jnp.transpose(logp, (1, 0, 2)),              # (T, B, V)
        jnp.broadcast_to(z[None], (T, B, S)), axis=2)  # (T, B, S)

    init = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0).at[:, 1].set(0.0)
    init = jnp.where(alive, init, NEG_INF)

    def shift(a, k):
        return jnp.pad(a, ((0, 0), (k, 0)), constant_values=NEG_INF)[:, :S]

    def fwd(alpha, xs):
        e, t = xs
        stay = alpha
        adv = shift(alpha, 1)
        skp = jnp.where(can_skip, shift(alpha, 2), NEG_INF)
        cand = jnp.stack([stay, adv, skp], 0)        # (3, B, S)
        bp = jnp.argmax(cand, axis=0).astype(jnp.int8)
        best = jnp.max(cand, axis=0)
        new = jnp.where(alive, best + e, NEG_INF)
        # the first frame consumes init directly (no transition)
        new = jnp.where(t == 0, jnp.where(alive, init + e, NEG_INF), new)
        bp = jnp.where(t == 0, jnp.zeros_like(bp), bp)
        # frames past logp_len: freeze (backtrack walks through with stay)
        live = (t < logp_len)[:, None]
        return (jnp.where(live, new, alpha),
                jnp.where(live, bp, jnp.zeros_like(bp)))

    alpha, bps = jax.lax.scan(fwd, init, (emit, jnp.arange(T)))

    # terminal: best of last-token state (2*label_len - 1) and final blank
    # (2*label_len); label_len == 0 degenerates to state 0
    s_tok = jnp.maximum(2 * label_len - 1, 0)
    s_blk = 2 * label_len
    a_tok = jnp.take_along_axis(alpha, s_tok[:, None], axis=1)[:, 0]
    a_blk = jnp.take_along_axis(alpha, s_blk[:, None], axis=1)[:, 0]
    end_state = jnp.where(a_tok >= a_blk, s_tok, s_blk).astype(jnp.int32)
    score = jnp.maximum(a_tok, a_blk)

    def bwd(cur, bp_t):
        # bp_t encodes the transition INTO the frame's state from the
        # previous frame; frozen (padded) frames recorded bp=0, so the
        # walk passes through them with the state unchanged
        step = jnp.take_along_axis(bp_t, cur[:, None], axis=1)[:, 0]
        return cur - step.astype(jnp.int32), cur

    _, states_rev = jax.lax.scan(bwd, end_state, bps[::-1])
    states = states_rev[::-1].T                      # (B, T)

    # frame -> token index: odd state s=2i+1 -> i; blank s=2i -> previous
    # token i-1 (leading blank -> 0)
    frame_tok = jnp.where(states % 2 == 1, (states - 1) // 2,
                          jnp.maximum(states // 2 - 1, 0))
    t_valid = jnp.arange(T)[None, :] < logp_len[:, None]
    onehot = jax.nn.one_hot(frame_tok, L, dtype=jnp.int32) * \
        t_valid[..., None].astype(jnp.int32)
    durations = onehot.sum(axis=1)
    durations = jnp.where(jnp.arange(L)[None, :] < label_len[:, None],
                          durations, 0)
    return CTCAlignment(path=jnp.where(t_valid, frame_tok, -1),
                        durations=durations, score=score)


def make_ctc_aligner(net, blank: Optional[int] = None):
    """Jitted ``fn(variables, feat, feat_len, labels, label_len) ->
    (CTCAlignment, enc_len)`` for an ARASR model with a CTC head: encode,
    log-softmax the CTC logits (sos/eos column masked like decoding,
    infer/streaming.py), Viterbi-align. Durations are in ENCODER frames
    (frontend hop x prenet downsampling)."""
    sos_eos = net.cfg.vocab_size - 1

    @jax.jit
    def align(variables, feat, feat_len, labels, label_len):
        from speechain_tpu.infer.quantize import dequantize_variables
        variables = dequantize_variables(variables)
        enc_feat, enc_len, _, _ = net.apply(
            variables, feat, feat_len, train=False,
            method=lambda m, f, fl, train: m.encode(f, fl, train=train))
        logits = net.apply(variables, enc_feat,
                           method=lambda m, x: m.ctc_logits(x))
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32).at[..., sos_eos].set(NEG_INF), -1)
        return ctc_forced_align(logp, labels, enc_len, label_len), enc_len

    return align
