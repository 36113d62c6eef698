"""Frame-synchronous CTC prefix beam search (infer/ctc_prefix_beam.py):
the vectorized static-shape implementation must match the classic
dict-based algorithm exactly, and the streaming two-pass path (prefix
beam over chunks + attention rescoring) must match running the same
beam offline on the full utterance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("seed,beam,prune", [(0, 4, 4), (1, 2, 6),
                                             (2, 6, 3)])
def test_prefix_beam_matches_oracle(seed, beam, prune):
    from speechain_tpu.infer.ctc_prefix_beam import (
        ctc_prefix_beam_offline, prefix_beam_oracle)

    rng = np.random.RandomState(seed)
    B, T, V = 3, 14, 8
    logits = rng.randn(B, T, V) * 2.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lens = np.array([T, T - 5, 4])

    toks, length, scores = ctc_prefix_beam_offline(
        jnp.asarray(logp), jnp.asarray(lens), beam_size=beam, prune=prune)
    toks, length, scores = map(np.asarray, (toks, length, scores))
    for b in range(B):
        want = prefix_beam_oracle(logp[b], int(lens[b]), beam, prune)
        for w in range(min(beam, len(want))):
            wp, ws = want[w]
            gp = tuple(toks[b, w, :length[b, w]])
            assert gp == wp, (b, w, gp, wp)
            assert abs(scores[b, w] - ws) < 1e-4


def test_prefix_beam_update_valid_mask_is_identity():
    """Rows with valid=False keep their state bit-identically (pool rows
    idle at their own cadence; padded chunk frames are no-ops)."""
    from speechain_tpu.infer.ctc_prefix_beam import (
        prefix_beam_init, prefix_beam_update)

    rng = np.random.RandomState(3)
    B, V, W = 2, 6, 3
    st = prefix_beam_init(B, W, max_len=8)
    for t in range(4):
        logits = rng.randn(B, V)
        logp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1,
                                                              keepdims=True)))
        st = prefix_beam_update(st, logp, valid=jnp.array([True, True]))
    frozen = prefix_beam_update(
        st, jnp.zeros((B, V)) - np.log(V),
        valid=jnp.array([False, False]))
    for a, b in zip(jax.tree_util.tree_leaves(frozen),
                    jax.tree_util.tree_leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mixed = prefix_beam_update(
        st, jnp.zeros((B, V)) - np.log(V),
        valid=jnp.array([True, False]))
    np.testing.assert_array_equal(np.asarray(mixed.length[1]),
                                  np.asarray(st.length[1]))


def test_streaming_beam_and_rescore_match_offline():
    """Chunked prefix beam == offline prefix beam on the full utterance,
    and the second-pass attention scores == direct teacher-forced decoder
    scoring of the n-best."""
    from tests.test_streaming import _causal_asr, _init, D
    from speechain_tpu.infer.streaming import StreamingASR
    from speechain_tpu.infer.ctc_prefix_beam import ctc_prefix_beam_offline
    from speechain_tpu.utils.masks import make_mask_from_len

    net, cfg = _causal_asr(encoder_type="conformer")
    n_wave = 3200
    wave, wave_len, variables = _init(net, n_wave, amp=1.0)
    W, P, LMAX = 4, 6, 32
    stream = StreamingASR(net, variables, chunk_samples=800, max_frames=256,
                          beam_size=W, beam_prune=P, max_text_len=LMAX,
                          rescore=True, rescore_weight=0.3)
    B = wave.shape[0]
    state = stream.reset(B)
    state, _, _ = stream.start(state, wave[:, :800])
    for c in range(1, n_wave // 800):
        state, _, _ = stream.step(state, wave[:, c * 800:(c + 1) * 800])
    state, _, _ = stream.finish(state, jnp.zeros((B, 800), jnp.float32), 0)

    # offline: same beam over the full-utterance CTC posteriors
    enc_feat, enc_len, enc_mask, _ = net.apply(
        variables, wave[..., None], wave_len, train=False,
        method=lambda m, f, fl, train: m.encode(f, fl, train=train))
    logits = net.apply(variables, enc_feat,
                       method=lambda m, x: m.ctc_logits(x))
    sos_eos = cfg.vocab_size - 1
    logp = jax.nn.log_softmax(
        logits.astype(jnp.float32).at[..., sos_eos].set(-1e30), -1)
    otoks, olen, oscores = ctc_prefix_beam_offline(
        logp, enc_len, beam_size=W, prune=P, max_len=LMAX)

    nb = stream.final_nbest(state, rescore=False)
    np.testing.assert_array_equal(nb["lengths"], np.asarray(olen))
    np.testing.assert_allclose(nb["score"], np.asarray(oscores), atol=1e-3)
    for b in range(B):
        for w in range(W):
            L = nb["lengths"][b, w]
            np.testing.assert_array_equal(nb["tokens"][b, w, :L],
                                          np.asarray(otoks)[b, w, :L])
    assert int(nb["lengths"][:, 0].sum()) > 0     # non-vacuous best beams

    # rescoring: att_score must equal direct decoder scoring of each n-best
    nb2 = stream.final_nbest(state)
    for b in range(B):
        for w in range(W):
            L = int(nb2["lengths"][b, w])
            hyp = [sos_eos] + nb2["tokens"][b, w, :L].tolist() + [sos_eos]
            text = jnp.asarray([hyp + [0] * (LMAX + 2 - len(hyp))],
                               jnp.int32)
            tlen = jnp.asarray([L + 2], jnp.int32)
            dlogits, *_ = net.apply(
                variables, enc_feat[b:b + 1], enc_mask[b:b + 1], text, tlen,
                method=lambda m, e, em, t, tl: m.decode(e, em, t, tl))
            dlogp = np.asarray(jax.nn.log_softmax(
                dlogits.astype(jnp.float32), -1))[0]
            want = sum(dlogp[i, hyp[i + 1]] for i in range(L + 1))
            np.testing.assert_allclose(nb2["att_score"][b, w], want,
                                       atol=2e-2)
    # sorted best-first by the combined score
    assert (np.diff(nb2["score"], axis=1) <= 1e-6).all()


def test_pool_beam_matches_offline_with_slot_reuse():
    """Continuous-batching two-pass: per-row beams ride the pool — each
    stream's captured n-best (and attention rescore) must equal the
    offline beam on that stream's waveform, including streams served by a
    REUSED slot (the beam resets in-kernel on start)."""
    from speechain_tpu.infer.stream_pool import StreamPool, StreamServer
    from speechain_tpu.infer.streaming import StreamingASR
    from speechain_tpu.infer.ctc_prefix_beam import ctc_prefix_beam_offline
    from tests.test_streaming import _causal_asr, _init

    net, cfg = _causal_asr(encoder_type="conformer")
    _, _, variables = _init(net)
    W, P, LMAX, S = 3, 5, 24, 800
    pool = StreamPool(net, variables, slots=2, chunk_samples=S,
                      max_frames=256, beam_size=W, beam_prune=P,
                      max_text_len=LMAX, rescore=True, rescore_weight=0.3)
    server = StreamServer(pool)

    rng = np.random.RandomState(9)
    waves = {f"s{i}": rng.randn(n).astype(np.float32) * 1.0
             for i, n in enumerate([2750, 1950, 3200])}  # 3 streams, 2 slots

    pending = list(waves)
    opened = set()
    for _ in range(80):
        while pending and server.active < 2:
            u = pending.pop(0)
            server.open(u)
            server.feed(u, waves[u])
            server.end(u)
            opened.add(u)
        server.step()
        if all(server.result(u) is not None for u in opened) and \
                not pending:
            break
    assert all(server.result(u) is not None for u in waves)

    sos_eos = cfg.vocab_size - 1
    for u, w in waves.items():
        feat = jnp.asarray(w)[None, :, None]
        flen = jnp.full((1,), len(w), jnp.int32)
        enc_feat, enc_len, _, _ = net.apply(
            variables, feat, flen, train=False,
            method=lambda m, f, fl, train: m.encode(f, fl, train=train))
        logits = net.apply(variables, enc_feat,
                           method=lambda m, x: m.ctc_logits(x))
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32).at[..., sos_eos].set(-1e30), -1)
        otoks, olen, oscores = ctc_prefix_beam_offline(
            logp, enc_len, beam_size=W, prune=P, max_len=LMAX)
        nb = server.nbest(u)
        # pool n-best is rescore-sorted; compare as sets of (prefix, ctc)
        got = {tuple(nb["tokens"][0, k, :nb["lengths"][0, k]]):
               nb["ctc_score"][0, k] for k in range(W)}
        want = {tuple(np.asarray(otoks)[0, k, :np.asarray(olen)[0, k]]):
                np.asarray(oscores)[0, k] for k in range(W)}
        assert set(got) == set(want), u
        for pref in got:
            np.testing.assert_allclose(got[pref], want[pref], atol=1e-3)

        # the lockstep path's rescored n-best agrees (same hypotheses and
        # attention scores) — pool slot multiplexing changes nothing
        lock = StreamingASR(net, variables, chunk_samples=S, max_frames=256,
                            beam_size=W, beam_prune=P, max_text_len=LMAX,
                            rescore=True, rescore_weight=0.3)
        st = lock.reset(1)
        n_full = len(w) // S
        st, _, _ = lock.start(st, jnp.asarray(w[:S])[None])
        for c in range(1, n_full):
            st, _, _ = lock.step(st, jnp.asarray(w[c * S:(c + 1) * S])[None])
        tail = np.zeros(S, np.float32)
        rest = w[n_full * S:]
        tail[:len(rest)] = rest
        st, _, _ = lock.finish(st, jnp.asarray(tail)[None], len(rest))
        ln = lock.final_nbest(st)
        np.testing.assert_array_equal(nb["lengths"], ln["lengths"])
        np.testing.assert_array_equal(nb["tokens"], ln["tokens"])
        np.testing.assert_allclose(nb["att_score"], ln["att_score"],
                                   atol=2e-2)


def test_final_nbest_lm_rescoring():
    """lm_score must equal a direct LM forward over [sos, prefix, eos],
    and the combined score must be ctc + lm_weight*lm when not
    attention-rescoring."""
    from tests.test_streaming import _causal_asr, _init
    from speechain_tpu.infer.streaming import StreamingASR
    from speechain_tpu.nn.lm import LanguageModelNet, LMConfig

    net, cfg = _causal_asr(encoder_type="transformer")
    wave, wave_len, variables = _init(net, 3200, amp=0.2)
    W = 3
    stream = StreamingASR(net, variables, chunk_samples=800, max_frames=256,
                          beam_size=W, beam_prune=5, max_text_len=16)
    B = wave.shape[0]
    state = stream.reset(B)
    state, _, _ = stream.start(state, wave[:, :800])
    for c in range(1, 4):
        state, _, _ = stream.step(state, wave[:, c * 800:(c + 1) * 800])
    state, _, _ = stream.finish(state, jnp.zeros((B, 800), jnp.float32), 0)

    V = cfg.vocab_size
    lm = LanguageModelNet(cfg=LMConfig(
        vocab_size=V, emb=dict(embedding_dim=16),
        encoder=dict(d_model=16, num_heads=2, num_layers=1, fdfwd_dim=32)))
    txt = jnp.ones((1, 4), jnp.int32)
    lm_vars = lm.init({"params": jax.random.PRNGKey(7)}, txt,
                      jnp.full((1,), 4, jnp.int32))

    nb = stream.final_nbest(state, lm_net=lm, lm_variables=lm_vars,
                            lm_weight=0.4)
    assert "lm_score" in nb
    np.testing.assert_allclose(
        nb["score"], nb["ctc_score"] + 0.4 * nb["lm_score"], atol=1e-5)
    assert (np.diff(nb["score"], axis=1) <= 1e-6).all()

    sos = V - 1
    for b in range(B):
        for w in range(W):
            L = int(nb["lengths"][b, w])
            hyp = [sos] + nb["tokens"][b, w, :L].tolist() + [sos]
            text = jnp.asarray([hyp], jnp.int32)
            tlen = jnp.full((1,), L + 2, jnp.int32)
            logits, *_ = lm.apply(lm_vars, text, tlen)
            logp = np.asarray(jax.nn.log_softmax(
                logits.astype(jnp.float32), -1))[0]
            want = sum(logp[i, hyp[i + 1]] for i in range(L + 1))
            np.testing.assert_allclose(nb["lm_score"][b, w], want,
                                       atol=1e-3)
