"""Inference engine tests: KV-cached beam search vs naive decoding, CTC
prefix scorer vs a direct numpy oracle of the reference algorithm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.infer.asr import asr_beam_search
from speechain_tpu.infer.ctc_scorer import CTCPrefixScorer
from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)
NEG_INF = -1e20


def _tiny_net(V=20, D=32, ctc=0.0):
    cfg = ARASRConfig(
        vocab_size=V,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=20),
        specaug=None,
        enc_prenet=dict(conv_dims=[16, 16], lnr_dims=D),
        encoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64),
        ctc_weight=ctc,
    )
    net = ARASRNet(cfg=cfg)
    B, T = 2, 8000
    feat = jax.random.normal(RNG, (B, T, 1)) * 0.3
    feat_len = jnp.array([T, T - 1600], jnp.int32)
    text = jnp.ones((B, 6), jnp.int32)
    text_len = jnp.full((B,), 6, jnp.int32)
    variables = net.init({"params": RNG, "dropout": RNG, "specaug": RNG},
                         feat, feat_len, text, text_len, train=False)
    return net, variables, feat, feat_len


def naive_greedy(net, variables, feat, feat_len, maxlen):
    """Reference-style greedy: full-prefix decoder recompute each step."""
    V = net.cfg.vocab_size
    sos = V - 1
    base = {k: v for k, v in variables.items() if k != "cache"}
    enc_feat, enc_feat_len, enc_mask, _ = net.apply(
        base, feat, feat_len, train=False, method=net.encode)
    B = feat.shape[0]
    hypo = np.full((B, 1), sos, np.int32)
    done = np.zeros(B, bool)
    for _ in range(maxlen - 1):
        text = jnp.asarray(np.concatenate(
            [hypo, np.full((B, 1), sos, np.int32)], 1))  # append dummy eos
        text_len = jnp.full((B,), text.shape[1], jnp.int32)
        logits, *_ = net.apply(base, enc_feat, enc_mask, text, text_len,
                               method=net.decode)
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))
        nxt = np.where(done, 0, nxt)
        hypo = np.concatenate([hypo, nxt[:, None]], 1)
        done |= nxt == sos
        if done.all():
            break
    outs = []
    for b in range(B):
        seq = []
        for t in hypo[b, 1:]:
            if t == sos or t == 0:
                break
            seq.append(int(t))
        outs.append(seq)
    return outs


def test_greedy_beam1_matches_naive_full_forward():
    net, variables, feat, feat_len = _tiny_net()
    maxlen = 12
    out = asr_beam_search(net, variables, feat, feat_len, beam_size=1,
                          max_len=maxlen, length_penalty=0.0)
    naive = naive_greedy(net, variables, feat, feat_len, maxlen)
    for b in range(feat.shape[0]):
        L = int(out["hypo_text_len"][b])
        got = [int(t) for t in np.asarray(out["hypo_text"][b][:L])]
        # beam-1 with length_penalty 0 follows the argmax path; the naive
        # loop may run one step longer before emitting eos at maxlen
        n = min(len(got), len(naive[b]))
        assert got[:n] == naive[b][:n], (got, naive[b])


def test_beam_search_shapes_and_monotone_confidence():
    net, variables, feat, feat_len = _tiny_net()
    out = asr_beam_search(net, variables, feat, feat_len, beam_size=4,
                          max_len=10)
    B, L = feat.shape[0], 10
    assert out["hypo_text"].shape == (B, L)
    assert out["hypo_text_len"].shape == (B,)
    assert np.isfinite(np.asarray(out["hypo_text_confid"])).all()
    # beam-4 best score must be >= beam-1 best score (larger search space)
    out1 = asr_beam_search(net, variables, feat, feat_len, beam_size=1,
                           max_len=10)
    assert (np.asarray(out["hypo_text_confid"])
            >= np.asarray(out1["hypo_text_confid"]) - 1e-4).all()


def test_beam_search_with_ctc_fusion_runs():
    net, variables, feat, feat_len = _tiny_net(ctc=0.3)
    out = asr_beam_search(net, variables, feat, feat_len, beam_size=3,
                          max_len=8, ctc_weight=0.3)
    assert np.isfinite(np.asarray(out["hypo_text_confid"])).all()
    assert (np.asarray(out["hypo_text_len"]) >= 0).all()


# ---------------------------------------------------------------------------
# CTC prefix scorer oracle: direct numpy port of the reference algorithm
# (infer_func/ctc_decoding.py:73-157) used as the golden
# ---------------------------------------------------------------------------

def oracle_ctc_prefix_scores(x_logp, enc_len, prefix, blank, eos):
    """Score all one-token extensions of `prefix` for a single utterance."""
    T, V = x_logp.shape
    x = x_logp.copy()
    x[enc_len:, :] = NEG_INF
    x[enc_len:, blank] = 0.0

    def logsumexp2(a, b):
        return np.logaddexp(a, b)

    L = len(prefix)
    # forward variables for the prefix g (empty prefix: all-blank paths)
    r_nb = np.full((T,), NEG_INF)
    r_b = np.cumsum(x[:, blank])
    last = None
    for tok in prefix:
        phi = r_b if tok == last else logsumexp2(r_nb, r_b)
        rn = np.full((T,), NEG_INF)
        rb = np.full((T,), NEG_INF)
        rn[0] = x[0, tok] if last is None else NEG_INF
        for t in range(1, T):
            rn[t] = logsumexp2(rn[t - 1], phi[t - 1]) + x[t, tok]
            rb[t] = logsumexp2(rn[t - 1], rb[t - 1]) + x[t, blank]
        r_nb, r_b, last = rn, rb, tok
    r_sum = logsumexp2(r_nb, r_b)
    last_tok = prefix[-1] if L else None

    psi = np.full((V,), NEG_INF)
    start = max(1, L)
    for c in range(V):
        if c == blank:
            continue
        if c == eos:
            psi[c] = r_sum[enc_len - 1]
            continue
        phi = r_b if c == last_tok else r_sum
        rn_c = np.full((T,), NEG_INF)
        rn_c[0] = x[0, c] if L == 0 else NEG_INF
        acc = rn_c[start - 1]
        for t in range(start, T):
            rn_c[t] = logsumexp2(rn_c[t - 1], phi[t - 1]) + x[t, c]
            acc = logsumexp2(acc, phi[t - 1] + x[t, c])
        psi[c] = acc
    return psi


@pytest.mark.parametrize("prefix", [[], [3], [3, 3], [3, 5, 3]])
def test_ctc_prefix_scorer_matches_oracle(prefix):
    T, V, blank = 9, 7, 0
    eos = V - 1
    rng = np.random.RandomState(1)
    logits = rng.randn(1, T, V).astype(np.float32)
    x_logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    enc_len = jnp.array([7])

    scorer = CTCPrefixScorer(x_logp, enc_len, beam_size=1, blank_id=blank,
                             eos_id=eos)
    state = scorer.init_state()
    # advance through the prefix
    for tok in prefix:
        scores = scorer.score(state)
        state = scorer.update_state(state, scores, jnp.array([0]),
                                    jnp.array([tok]))
    inc = np.asarray(scorer.score(state))[0]

    oracle_psi = oracle_ctc_prefix_scores(
        np.asarray(x_logp)[0].astype(np.float64), 7, prefix, blank, eos)
    # our scores are psi(h) - psi(g); compute oracle increment likewise
    if prefix:
        prev_psi = oracle_ctc_prefix_scores(
            np.asarray(x_logp)[0].astype(np.float64), 7, prefix[:-1],
            blank, eos)[prefix[-1]]
    else:
        prev_psi = 0.0
    want = oracle_psi - prev_psi
    mask = np.arange(V) != blank
    np.testing.assert_allclose(inc[mask], want[mask], atol=1e-3, rtol=1e-3)


def _tiny_lm(V=20, D=32):
    from speechain_tpu.nn.lm import LanguageModelNet, LMConfig
    cfg = LMConfig(vocab_size=V, emb=dict(embedding_dim=D),
                   encoder=dict(d_model=D, num_heads=4, num_layers=2,
                                fdfwd_dim=64))
    net = LanguageModelNet(cfg=cfg)
    text = jax.random.randint(RNG, (2, 6), 1, V - 1)
    text_len = jnp.full((2,), 6, jnp.int32)
    variables = net.init({"params": RNG, "dropout": RNG}, text, text_len)
    return net, variables


def test_lm_window_covering_prefix_matches_cached_fusion():
    """A window >= maxlen covers the whole prefix with positions starting
    at 0, so windowed fusion must equal the KV-cached full-prefix fusion
    (reference beam_search.py:321-339 windowed LM path)."""
    net, variables, feat, feat_len = _tiny_net()
    lm_net, lm_vars = _tiny_lm()
    maxlen = 10
    kw = dict(beam_size=3, max_len=maxlen, lm_net=lm_net,
              lm_variables=lm_vars, lm_weight=0.4)
    cached = asr_beam_search(net, variables, feat, feat_len, **kw)
    windowed = asr_beam_search(net, variables, feat, feat_len,
                               lm_window_size=maxlen + 1, **kw)
    np.testing.assert_array_equal(np.asarray(cached["hypo_text"]),
                                  np.asarray(windowed["hypo_text"]))
    np.testing.assert_allclose(np.asarray(cached["hypo_text_confid"]),
                               np.asarray(windowed["hypo_text_confid"]),
                               rtol=1e-4, atol=1e-5)


def test_lm_window_small_changes_scores_but_runs_clean():
    """W=2 truncates context: search still terminates with finite scores
    and valid token ids."""
    net, variables, feat, feat_len = _tiny_net()
    lm_net, lm_vars = _tiny_lm()
    out = asr_beam_search(net, variables, feat, feat_len, beam_size=3,
                          max_len=10, lm_net=lm_net, lm_variables=lm_vars,
                          lm_weight=0.4, lm_window_size=2)
    assert np.isfinite(np.asarray(out["hypo_text_confid"])).all()
    V = net.cfg.vocab_size
    assert (np.asarray(out["hypo_text"]) < V).all()


def test_sent_per_beam_nbest_output():
    """sent_per_beam > 1 returns ranked n-best hypotheses (the reference
    raises NotImplementedError here, beam_search.py:190-200); the 1-best
    row must match the default output exactly."""
    net, variables, feat, feat_len = _tiny_net()
    one = asr_beam_search(net, variables, feat, feat_len, beam_size=4,
                          max_len=10)
    nb = asr_beam_search(net, variables, feat, feat_len, beam_size=4,
                         max_len=10, sent_per_beam=3)
    assert nb["nbest_text"].shape[1] == 3
    np.testing.assert_array_equal(np.asarray(nb["hypo_text"]),
                                  np.asarray(one["hypo_text"]))
    np.testing.assert_array_equal(np.asarray(nb["nbest_text"][:, 0]),
                                  np.asarray(nb["hypo_text"]))
    scores = np.asarray(nb["nbest_confid"])
    assert (np.diff(scores, axis=1) <= 1e-6).all(), "ranked descending"
    # every hypothesis padded with padding_idx beyond its length
    lens = np.asarray(nb["nbest_text_len"])
    toks = np.asarray(nb["nbest_text"])
    for b in range(toks.shape[0]):
        for n in range(3):
            assert (toks[b, n, lens[b, n]:] == 0).all()
