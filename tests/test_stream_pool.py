"""Continuous-batching streaming (infer/stream_pool.py): concurrent
streams in arbitrary phases — attaching, stepping, idling, finishing,
restarting in reused slots — must each emit exactly the tokens the
offline model produces on that stream's waveform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_streaming import _causal_asr, _init, _offline_tokens

pytestmark = pytest.mark.slow

S = 800  # chunk samples (hop=80 at sr=8000 -> m=10 frames/chunk)


def _waves(lengths, seed=5, amp=0.2):
    # amp: random conformers are blank-dominated at low input energy —
    # their non-vacuous (token-emitting) tests need amp >= 1.0
    rng = np.random.RandomState(seed)
    return {f"s{i}": rng.randn(n).astype(np.float32) * amp
            for i, n in enumerate(lengths)}


def _offline(net, variables, wave):
    return _offline_tokens(net, variables,
                           jnp.asarray(wave)[None],
                           jnp.full((1,), len(wave), jnp.int32))[0]


def _build_server(slots=3, feat_norm=True, encoder_type="transformer"):
    from speechain_tpu.infer.stream_pool import StreamPool, StreamServer

    net, _ = _causal_asr(feat_norm=feat_norm, encoder_type=encoder_type)
    _, _, variables = _init(net)
    pool = StreamPool(net, variables, slots=slots, chunk_samples=S,
                      max_frames=256)
    return net, variables, StreamServer(pool)


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_pool_matches_offline_staggered(encoder_type):
    """Streams of different lengths attach at different ticks, feed at
    different rates (forcing idle ticks), and all finish exactly."""
    net, variables, server = _build_server(encoder_type=encoder_type)
    waves = _waves([2750, 1950, 3200],
                   amp=1.0 if encoder_type == "conformer" else 0.2)
    feed_rate = {"s0": 500, "s1": 1000, "s2": 800}
    attach_at = {"s0": 0, "s1": 3, "s2": 0}
    fed = {u: 0 for u in waves}

    got = {}
    for tick in range(60):
        for u, w in waves.items():
            if tick == attach_at[u]:
                server.open(u)
            if tick >= attach_at[u] and fed[u] < len(w):
                n = min(feed_rate[u], len(w) - fed[u])
                server.feed(u, w[fed[u]:fed[u] + n])
                fed[u] += n
                if fed[u] == len(w):
                    server.end(u)
        server.step()
        for u in list(waves):
            r = server.result(u)
            if r is not None and u not in got:
                got[u] = r
        if len(got) == len(waves):
            break

    assert len(got) == len(waves), f"unfinished: {set(waves) - set(got)}"
    for u, w in waves.items():
        assert got[u] == _offline(net, variables, w), u
    assert sum(len(t) for t in got.values()) > 0  # not vacuously empty


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_slot_reuse_is_exact(encoder_type):
    """A slot that served stream A must serve stream B exactly afterwards:
    stale KV-cache/mel-buffer/carry state from A may never leak into B
    (for the conformer that includes the conv-module left-context cache,
    which unlike the KV cache is NOT healed by position overwrite)."""
    net, variables, server = _build_server(slots=1,
                                           encoder_type=encoder_type)
    waves = _waves([2400, 3150], seed=9,
                   amp=1.0 if encoder_type == "conformer" else 0.2)
    n_emitted = 0

    for u, w in waves.items():           # sequentially through the ONE slot
        server.open(u)
        server.feed(u, w)
        server.end(u)
        server.drain()
        assert server.result(u) == _offline(net, variables, w), u
        n_emitted += len(server.result(u))
    assert n_emitted > 0                 # staleness check is non-vacuous


def test_oneshot_short_stream():
    """A stream shorter than one chunk goes through MODE_ONESHOT (left and
    right reflect pads in a single tick) and still matches offline."""
    net, variables, server = _build_server(slots=2, feat_norm=False)
    n_fft = net.cfg.frontend.fft
    w = _waves([n_fft], seed=3)["s0"]    # > n_fft/2, < one chunk
    server.open("short")
    server.feed("short", w)
    server.end("short")
    server.drain()
    assert server.result("short") == _offline(net, variables, w)


def test_pool_slot_lifecycle_guards():
    net, variables, server = _build_server(slots=1)
    server.open("a")
    with pytest.raises(RuntimeError, match="no free slots"):
        server.open("b")
    with pytest.raises(ValueError, match="already exists"):
        server.open("a")
    p = net.cfg.frontend.fft // 2
    server.feed("a", np.zeros(p, np.float32))     # too short to ever frame
    with pytest.raises(ValueError, match="reflect-pad"):
        server.end("a")


def test_pool_weight_quant_matches_quantized_offline():
    """int8 serving through the pool: streamed tokens must equal the
    offline CTC-greedy output of the DEQUANTIZED model (the float tree the
    int8 executables reproduce exactly)."""
    import jax.numpy as jnp

    from speechain_tpu.infer.quantize import MARKER
    from speechain_tpu.infer.stream_pool import StreamPool, StreamServer

    net, _ = _causal_asr()
    _, _, variables = _init(net)
    pool = StreamPool(net, variables, slots=2, chunk_samples=S,
                      max_frames=256, weight_quant="int8",
                      wq_min_elems=256)   # tiny test kernels must quantize
    # quantization actually selected weights (guards a vacuous pass)
    flat = jax.tree_util.tree_leaves_with_path(
        pool.exec_variables, is_leaf=lambda n: isinstance(n, dict)
        and MARKER in n)
    assert any(isinstance(leaf, dict) and MARKER in leaf
               for _, leaf in flat)
    server = StreamServer(pool)
    waves = _waves([2750, 1950], seed=11)
    for u, w in waves.items():
        server.open(u)
        server.feed(u, w)
        server.end(u)
    server.drain()
    for u, w in waves.items():
        want = _offline_tokens(net, pool.offline_variables,
                               jnp.asarray(w)[None],
                               jnp.full((1,), len(w), jnp.int32))[0]
        assert server.result(u) == want, u


def test_blank_run_tracks_offline_trailing_blanks():
    """The in-kernel endpointing counter must equal the trailing-blank
    count of the offline argmax over exactly the frames emitted so far,
    and the server's sticky endpoint flag must follow it."""
    import jax.numpy as jnp

    from speechain_tpu.infer.stream_pool import StreamPool, StreamServer
    from speechain_tpu.infer.streaming import ctc_greedy_offline

    net, _ = _causal_asr()
    _, _, variables = _init(net)
    pool = StreamPool(net, variables, slots=1, chunk_samples=S,
                      max_frames=256)
    fe = net.cfg.frontend
    frame_ms = pool.s_eff * fe.hop / fe.sr * 1000.0
    server = StreamServer(pool, endpoint_blank_ms=2 * frame_ms)  # 2 frames

    w = _waves([3200], seed=21)["s0"]
    # offline argmax over the whole wave (frames prefix-stable: causal)
    ids, _ = ctc_greedy_offline(net, variables, jnp.asarray(w)[None, :, None],
                                jnp.full((1,), len(w), jnp.int32))
    server.open("u")
    seen_ep = False
    for c in range(len(w) // S):
        server.feed("u", w[c * S:(c + 1) * S])
        server.step()
        j = int(np.asarray(server.state.enc_frames)[0])
        run = int(np.asarray(server.state.blank_run)[0])
        prefix = ids[0][:j]
        want = 0
        while want < j and prefix[j - 1 - want] == 0:
            want += 1
        assert run == want, (c, run, want)
        seen_ep = seen_ep or run >= 2
        assert server.endpointed("u") == seen_ep, (c, run)
    server.end("u")
    server.drain()
    assert server.result("u") is not None


def test_result_frames_match_offline_emit_positions():
    """Per-token emission timestamps: the global encoder-frame index the
    server records for every token must equal the position of that
    token's emit in the offline greedy decode (causal model: prefix
    stability makes them identical), across staggered concurrent streams
    and slot reuse."""
    import jax.numpy as jnp

    from speechain_tpu.infer.stream_pool import StreamPool, StreamServer
    from speechain_tpu.infer.streaming import ctc_greedy_offline

    net, _ = _causal_asr()
    _, _, variables = _init(net)
    pool = StreamPool(net, variables, slots=2, chunk_samples=S,
                      max_frames=256)
    server = StreamServer(pool)
    assert server.frame_seconds > 0

    waves = _waves([2750, 1950, 3200], seed=17)   # 3 streams, 2 slots
    pending = list(waves.items())
    live = {}
    got_f = {}
    while pending or live:
        while pending and server.active < 2:
            u, w = pending.pop(0)
            server.open(u)
            server.feed(u, w)
            server.end(u)
            live[u] = True
        server.step()
        for u in list(live):
            if server.result(u) is not None:
                got_f[u] = (server.result(u), server.result_frames(u))
                del live[u]

    for u, w in waves.items():
        ids, emit = ctc_greedy_offline(
            net, variables, jnp.asarray(w)[None, :, None],
            jnp.full((1,), len(w), jnp.int32))
        toks, frames = got_f[u]
        assert toks == ids[0][emit[0]].tolist(), u
        assert frames == np.nonzero(np.asarray(emit[0]))[0].tolist(), u
        assert len(frames) == len(toks)


def test_cutoff_is_exact_on_consumed_prefix():
    """cutoff() (the endpointing action) must end the stream where it
    stands: the flushed result equals offline decode of exactly the
    samples consumed before the cut, and the discarded count is right."""
    import jax.numpy as jnp

    from speechain_tpu.infer.stream_pool import StreamPool, StreamServer
    from speechain_tpu.infer.streaming import ctc_greedy_offline

    net, _ = _causal_asr()
    _, _, variables = _init(net)
    pool = StreamPool(net, variables, slots=1, chunk_samples=S,
                      max_frames=256)
    server = StreamServer(pool)

    w = _waves([4000], seed=13)["s0"]
    server.open("u")
    server.feed("u", w)
    for _ in range(3):               # consume 3 chunks of 5
        server.step()
    assert server.buffered("u") == len(w) - 3 * S
    assert server.cutoff("u") == len(w) - 3 * S
    server.drain()
    got = server.result("u")

    prefix = w[:3 * S]
    ids, emit = ctc_greedy_offline(net, variables,
                                   jnp.asarray(prefix)[None, :, None],
                                   jnp.full((1,), len(prefix), jnp.int32))
    assert got == ids[0][emit[0]].tolist()


def test_encoder_per_row_decode_positions():
    """Unit: the causal encoder's chunked KV decode with a per-row
    position VECTOR — rows advancing by different valid counts reproduce
    the full pass row-for-row."""
    from speechain_tpu.nn.transformer import TransformerEncoder

    D, B, T, Tq = 32, 3, 12, 4
    rng = jax.random.PRNGKey(2)
    enc = TransformerEncoder(d_model=D, num_heads=4, num_layers=2,
                             fdfwd_dim=64, uni_direction=True)
    x = jax.random.normal(rng, (B, T, D))
    variables = enc.init({"params": rng}, x, None)
    full, *_ = enc.apply(variables, x, None)

    # capacity slack >= Tq: a write of Tq rows at position near T must not
    # clamp backwards (dynamic_update_slice clamps its start index)
    cap = T + Tq
    _, primed = enc.apply(variables, x[:, :1], None, decode=True,
                          prime=True, cache_capacity=cap, mutable=["cache"])
    cache = primed["cache"]
    # per-row advance schedule: row b consumes adv[b] valid frames per call
    adv = np.array([4, 3, 2])
    pos = np.zeros(B, np.int32)
    out = np.zeros((B, T, D), np.float32)
    for _ in range(6):
        if (pos >= T).all():
            break
        chunk = np.zeros((B, Tq, D), np.float32)
        for b in range(B):
            n = min(adv[b], T - pos[b])
            chunk[b, :n] = np.asarray(x[b, pos[b]:pos[b] + n])
        (o, *_), cv = enc.apply(
            {**variables, "cache": cache}, jnp.asarray(chunk), None,
            decode=True, cache_capacity=cap,
            decode_position=jnp.asarray(pos), mutable=["cache"])
        cache = cv["cache"]
        o = np.asarray(o)
        for b in range(B):
            n = min(adv[b], T - pos[b])
            out[b, pos[b]:pos[b] + n] = o[b, :n]
            pos[b] += n
    np.testing.assert_allclose(out, np.asarray(full), atol=1e-5)
