"""Streaming ASR (infer/streaming.py): the chunked pipeline must emit
exactly the tokens the offline model produces on the concatenated wave —
frontend framing, feat-norm, prenet ring buffer, chunked KV-cache encoder,
and CTC greedy collapse all included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(11)
D = 32


def _causal_asr(feat_norm=True, encoder_type="transformer"):
    from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
    from speechain_tpu.ops.feat_norm import FeatNormConfig
    from speechain_tpu.ops.frontend import FrontendConfig

    encoder = dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64,
                   uni_direction=True)
    if encoder_type == "conformer":
        encoder["depthwise_kernel_size"] = 7
    cfg = ARASRConfig(
        vocab_size=16,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01, preemphasis=0.97),
        feat_norm=FeatNormConfig(feat_dim=20) if feat_norm else None,
        enc_prenet=dict(conv_dims=[16, 16], conv_kernel=3, conv_stride=2,
                        lnr_dims=D),
        encoder_type=encoder_type,
        encoder=encoder,
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=1, fdfwd_dim=64),
        ctc_weight=0.5)
    return ARASRNet(cfg=cfg), cfg


def _init(net, n_wave=2750, amp=0.2):
    # amp: random conformers are blank-dominated at low input energy —
    # their non-vacuous (token-emitting) tests need amp >= 1.0
    B = 2
    wave = jax.random.normal(RNG, (B, n_wave)) * amp
    wave_len = jnp.full((B,), n_wave, jnp.int32)
    text = jnp.array([[1, 3, 4, 2], [1, 5, 6, 2]], jnp.int32)
    text_len = jnp.full((B,), 4, jnp.int32)
    variables = net.init({"params": RNG, "dropout": RNG, "specaug": RNG},
                         wave[..., None], wave_len, text, text_len,
                         train=False)
    return wave, wave_len, variables


def _stream_tokens(stream, wave, S, tail_len):
    """Drive the stream over `wave` and collect emitted tokens per row."""
    B, N = wave.shape
    n_full = (N - tail_len) // S
    state = stream.reset(B)
    out = [[] for _ in range(B)]

    def collect(ids, emit):
        ids, emit = np.asarray(ids), np.asarray(emit)
        for b in range(B):
            out[b].extend(ids[b][emit[b]].tolist())

    state, ids, emit = stream.start(state, wave[:, :S])
    collect(ids, emit)
    for c in range(1, n_full):
        state, ids, emit = stream.step(state, wave[:, c * S:(c + 1) * S])
        collect(ids, emit)
    tail = jnp.zeros((B, S), wave.dtype)
    if tail_len:
        tail = tail.at[:, :tail_len].set(wave[:, n_full * S:])
    state, ids, emit = stream.finish(state, tail, tail_len)
    collect(ids, emit)
    return out, state


def _offline_tokens(net, variables, wave, wave_len):
    from speechain_tpu.infer.streaming import ctc_greedy_offline
    ids, emit = ctc_greedy_offline(net, variables, wave[..., None], wave_len)
    return [ids[b][emit[b]].tolist() for b in range(ids.shape[0])]


@pytest.mark.parametrize("tail_len,encoder_type", [
    (350, "transformer"), (0, "transformer"),
    (350, "conformer"), (0, "conformer")])
def test_streaming_matches_offline(tail_len, encoder_type):
    from speechain_tpu.infer.streaming import StreamingASR

    net, cfg = _causal_asr(encoder_type=encoder_type)
    n_wave = 2400 + tail_len
    wave, wave_len, variables = _init(
        net, n_wave, amp=1.0 if encoder_type == "conformer" else 0.2)
    stream = StreamingASR(net, variables, chunk_samples=800, max_frames=256)

    got, state = _stream_tokens(stream, wave, 800, tail_len)
    want = _offline_tokens(net, variables, wave, wave_len)
    assert got == want, (got, want)
    assert sum(len(t) for t in want) > 0   # non-vacuous: tokens emitted

    # the stream saw exactly the offline encoder frame count
    enc_feat, enc_len, _, _ = net.apply(
        variables, wave[..., None], wave_len, train=False,
        method=lambda m, f, fl, train: m.encode(f, fl, train=train))
    assert int(state.enc_frames) == int(np.asarray(enc_len)[0])


def test_streaming_chunk_size_invariance():
    """Different chunkings of the same wave emit the same tokens."""
    from speechain_tpu.infer.streaming import StreamingASR

    net, cfg = _causal_asr(feat_norm=False)
    wave, wave_len, variables = _init(net, n_wave=3200)

    tok_a, _ = _stream_tokens(
        StreamingASR(net, variables, chunk_samples=800, max_frames=256),
        wave, 800, 0)
    tok_b, _ = _stream_tokens(
        StreamingASR(net, variables, chunk_samples=1600, max_frames=256),
        wave, 1600, 0)
    assert tok_a == tok_b
    assert tok_a == _offline_tokens(net, variables, wave, wave_len)


def test_streaming_rejects_unstreamable_configs():
    from speechain_tpu.infer.streaming import StreamingASR
    from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
    from speechain_tpu.ops.frontend import FrontendConfig

    net, _ = _causal_asr()
    wave, wave_len, variables = _init(net)

    # non-causal encoder
    bad = ARASRNet(cfg=net.cfg.replace(
        encoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64)))
    with pytest.raises(ValueError, match="uni_direction"):
        StreamingASR(bad, variables, chunk_samples=800)
    # non-causal conformer (causal conformers stream; see
    # test_streaming_conformer_matches_offline)
    bad = ARASRNet(cfg=net.cfg.replace(
        encoder_type="conformer",
        encoder=dict(net.cfg.encoder, uni_direction=False)))
    with pytest.raises(ValueError, match="uni_direction"):
        StreamingASR(bad, variables, chunk_samples=800)
    # no CTC head
    bad = ARASRNet(cfg=net.cfg.replace(ctc_weight=0.0))
    with pytest.raises(ValueError, match="ctc_weight"):
        StreamingASR(bad, variables, chunk_samples=800)
    # chunk not a hop multiple
    with pytest.raises(ValueError, match="multiple"):
        StreamingASR(net, variables, chunk_samples=801)
    # utterance-granularity norm cannot stream
    from speechain_tpu.ops.feat_norm import FeatNormConfig
    bad = ARASRNet(cfg=net.cfg.replace(
        feat_norm=FeatNormConfig(feat_dim=20, norm_type="utterance")))
    with pytest.raises(ValueError, match="per-frame"):
        StreamingASR(bad, variables, chunk_samples=800)


def test_chunked_decode_equals_full_causal_encoder():
    """The generalized per-row decode mask: feeding a causal encoder its
    input in chunks through the KV cache reproduces the full pass."""
    from speechain_tpu.nn.transformer import TransformerEncoder

    enc = TransformerEncoder(d_model=D, num_heads=4, num_layers=2,
                             fdfwd_dim=64, uni_direction=True)
    B, T = 2, 12
    x = jax.random.normal(RNG, (B, T, D))
    variables = enc.init({"params": RNG}, x, None)

    full, *_ = enc.apply(variables, x, None)

    _, primed = enc.apply(variables, x[:, :1], None, decode=True, prime=True,
                          cache_capacity=T, mutable=["cache"])
    cache = primed["cache"]
    outs, pos = [], 0
    for size in (1, 3, 2, 6):  # mixed chunk sizes
        (o, *_), cv = enc.apply(
            {**variables, "cache": cache}, x[:, pos:pos + size], None,
            decode=True, cache_capacity=T,
            decode_position=jnp.asarray(pos, jnp.int32), mutable=["cache"])
        outs.append(o)
        cache = cv["cache"]
        pos += size
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(full), atol=1e-5)


@pytest.mark.slow
def test_stream_cli_end_to_end(tmp_path):
    """Full user path: runner-train a causal ASR from a recipe YAML, then
    transcribe test wavs with speechain-stream --selftest (which asserts
    stream == offline on every file) and write an idx2text."""
    import os

    from speechain_tpu import runner
    from speechain_tpu.pyscripts import stream_cli
    from tests.test_runner import CONFIG_TEMPLATE, make_dataset

    cfg_text = CONFIG_TEMPLATE.format(
        root=make_dataset(str(tmp_path / "data"), n_train=16, n_valid=8,
                          n_test=4),
        epochs=4,
    ).replace(
        "        label_smoothing: 0.0",
        "        label_smoothing: 0.0\n        ctc_weight: 0.5",
    ).replace(
        "          d_model: 48\n          num_heads: 4\n"
        "          num_layers: 2",
        "          uni_direction: true\n"
        "          d_model: 48\n          num_heads: 4\n"
        "          num_layers: 2",
    )
    assert "uni_direction" in cfg_text and "ctc_weight" in cfg_text
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    runner.train_main(runner.merge_config(args), args)

    wav_scp = str(tmp_path / "data" / "test" / "idx2wav")
    out = str(tmp_path / "idx2text_streamed")
    stream_cli.main(["--config", cfg_path, "--result_path", exp,
                     "--wav_scp", wav_scp, "--output", out,
                     "--chunk_ms", "300", "--max_frames", "512",
                     "--selftest"])
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 4  # every test wav transcribed (selftest passed)

    # the continuous-batching path (--concurrency) serves the same wavs
    # through the StreamPool and must transcribe identically
    out_pool = str(tmp_path / "idx2text_pooled")
    stream_cli.main(["--config", cfg_path, "--result_path", exp,
                     "--wav_scp", wav_scp, "--output", out_pool,
                     "--chunk_ms", "300", "--max_frames", "512",
                     "--concurrency", "4", "--selftest"])
    assert sorted(open(out_pool).read().strip().splitlines()) == \
        sorted(lines)

    # two-pass serving: first-pass prefix beam + attention rescoring
    # (--selftest still checks the greedy partial stream against offline)
    out_beam = str(tmp_path / "idx2text_beam")
    stream_cli.main(["--config", cfg_path, "--result_path", exp,
                     "--wav_scp", wav_scp, "--output", out_beam,
                     "--chunk_ms", "300", "--max_frames", "512",
                     "--beam", "4", "--rescore", "--selftest"])
    assert len(open(out_beam).read().strip().splitlines()) == 4


@pytest.mark.slow
def test_stream_cli_endpointing(tmp_path, capsys):
    """--endpoint_blank_ms stops a stream at a long silence: the CLI
    prints an 'endpointed' line, discards the unread audio, and its
    internal --selftest asserts the tokens equal offline decode of the
    consumed prefix."""
    from speechain_tpu import runner
    from speechain_tpu.pyscripts import stream_cli
    from speechain_tpu.utils.fileio import (read_data_by_path,
                                            read_idx2data_file, write_wav)
    from tests.test_runner import CONFIG_TEMPLATE, make_dataset

    cfg_text = CONFIG_TEMPLATE.format(
        root=make_dataset(str(tmp_path / "data"), n_train=16, n_valid=8,
                          n_test=2),
        epochs=4,
    ).replace(
        "        label_smoothing: 0.0",
        "        label_smoothing: 0.0\n        ctc_weight: 0.5",
    ).replace(
        "          d_model: 48\n          num_heads: 4\n"
        "          num_layers: 2",
        "          uni_direction: true\n"
        "          d_model: 48\n          num_heads: 4\n"
        "          num_layers: 2",
    )
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    runner.train_main(runner.merge_config(args), args)

    # one test wav + 2 s of silence: the trained CTC model emits blanks
    # there, so a 300 ms blank threshold must fire inside it
    wav_scp = read_idx2data_file(
        str(tmp_path / "data" / "test" / "idx2wav"))
    idx, path = next(iter(wav_scp.items()))
    wave, sr = read_data_by_path(path, return_sample_rate=True)
    wave = np.concatenate([np.asarray(wave, np.float32).reshape(-1),
                           np.zeros(2 * sr, np.float32)])
    wpath = str(tmp_path / "padded.wav")
    write_wav(wpath, wave, sr)
    scp2 = str(tmp_path / "idx2wav_padded")
    with open(scp2, "w") as f:
        f.write(f"{idx} {wpath}\n")

    out = str(tmp_path / "idx2text_ep")
    stream_cli.main(["--config", cfg_path, "--result_path", exp,
                     "--wav_scp", scp2, "--output", out,
                     "--chunk_ms", "300", "--max_frames", "512",
                     "--endpoint_blank_ms", "300", "--selftest",
                     "--timestamps"])
    printed = capsys.readouterr().out
    assert "endpointed at" in printed          # the signal fired
    assert "selftest OK" in printed            # exact on consumed prefix
    assert len(open(out).read().strip().splitlines()) == 1
    # --timestamps wrote per-token seconds, monotonic nondecreasing
    tline = open(out + "_time").read().strip().splitlines()
    assert len(tline) == 1
    secs = [float(x) for x in tline[0].split()[1:]]
    assert secs == sorted(secs)
