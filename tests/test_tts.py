"""TTS stack tests: AR-TTS model, FastSpeech2, AR decoding, Griffin-Lim."""

import jax
import jax.numpy as jnp
import numpy as np

from speechain_tpu.infer.tts_decoding import tts_auto_regression
from speechain_tpu.models.ar_tts import ARTTSConfig, ARTTSNet, artts_loss
from speechain_tpu.models.nar_tts import (
    FastSpeech2Config,
    FastSpeech2Net,
    average_scalar_by_duration,
    fastspeech2_loss,
    length_regulate,
    proc_duration,
)
from speechain_tpu.ops import griffin_lim as G
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig, LogMelFrontend
import pytest

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)
D = 32


def _artts_cfg(**kw):
    base = dict(
        vocab_size=30,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=20),
        reduction_factor=2,
        enc_emb=dict(embedding_dim=D),
        enc_prenet=dict(conv_dims=[D], conv_kernel=5, lnr_dims=-1),
        encoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64),
        dec_prenet=dict(lnr_dims=[D, D], lnr_dropout=0.5),
        decoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64),
        postnet=dict(conv_dims=[D, D], conv_kernel=5),
        spk_emb=dict(spk_num=5, spk_emb_comb="concat"),
        att_guid_sigma=0.2,
    )
    base.update(kw)
    return ARTTSConfig(**base)


def test_artts_forward_loss_grads():
    cfg = _artts_cfg()
    net = ARTTSNet(cfg=cfg)
    B, Ttxt, Twav = 2, 9, 8000
    text = jax.random.randint(RNG, (B, Ttxt), 1, 29)
    text_len = jnp.array([9, 7])
    wave = jax.random.normal(RNG, (B, Twav, 1)) * 0.1
    wave_len = jnp.array([Twav, Twav - 1000])
    spk_ids = jnp.array([0, 3])
    variables = net.init({"params": RNG, "dropout": RNG}, text, text_len,
                         wave, wave_len, spk_ids=spk_ids, train=False)
    out, muts = net.apply(variables, text, text_len, wave, wave_len,
                          spk_ids=spk_ids, train=True, epoch=jnp.asarray(1),
                          rngs={"dropout": RNG},
                          mutable=["norm_stats", "batch_stats"])
    loss, metrics = artts_loss(out, cfg)
    assert out["pred_after"].shape == out["tgt_feat"].shape
    assert out["pred_after"].shape[-1] == 40  # n_mels * reduction
    assert np.isfinite(float(loss))
    # recovery inverts reduction grouping + normalization (training-layout
    # predictions need ungroup=True; AR-decoded outputs are pre-unfolded)
    rec = net.apply({**variables, **muts}, out["pred_after"], spk_ids,
                    ungroup=True, method=net.recover_feat)
    assert rec.shape == (B, out["pred_after"].shape[1] * 2, 20)


def test_tts_auto_regression_stops_and_shapes():
    cfg = _artts_cfg(enc_prenet=None, att_guid_sigma=0.0, spk_emb=None)
    net = ARTTSNet(cfg=cfg)
    text = jax.random.randint(RNG, (2, 7), 1, 29)
    text_len = jnp.array([7, 5])
    wave = jax.random.normal(RNG, (2, 8000, 1)) * 0.1
    wl = jnp.array([8000, 8000])
    variables = net.init({"params": RNG, "dropout": RNG}, text, text_len,
                         wave, wl, train=False)
    out = tts_auto_regression(net, variables, text, text_len, max_frames=20,
                              maxlen_ratio=4.0)
    # reduction factor 2 unfolds frames
    assert out["hypo_feat"].shape == (2, 40, 20)
    lens = np.asarray(out["hypo_feat_len"])
    assert (lens > 0).all() and (lens <= 40).all() and (lens % 2 == 0).all()


def test_fastspeech2_units():
    fs = jnp.asarray(np.random.RandomState(0).randn(2, 10).astype(np.float32))
    dur = jnp.asarray([[2, 3, 5, 0], [4, 4, 2, 0]], jnp.float32)
    got = average_scalar_by_duration(fs, dur)
    np.testing.assert_allclose(float(got[0, 0]), float(fs[0, :2].mean()),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got[1, 1]), float(fs[1, 4:8].mean()),
                               rtol=1e-5)

    enc = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    frames, flen = length_regulate(
        enc, jnp.asarray([[2, 1, 3], [1, 1, 1]], jnp.float32), 8)
    assert list(np.asarray(flen)) == [6, 3]
    np.testing.assert_allclose(np.asarray(frames[0, 0]), np.asarray(enc[0, 0]))
    np.testing.assert_allclose(np.asarray(frames[0, 2]), np.asarray(enc[0, 1]))
    np.testing.assert_allclose(np.asarray(frames[0, 5]), np.asarray(enc[0, 2]))
    # beyond total: zeroed
    np.testing.assert_allclose(np.asarray(frames[1, 3:]), 0.0)

    # proc_duration: values that ROUND to zero stay zero despite the
    # min_frame_num clamp (the reference takes the zero mask after rounding,
    # decoder/nar_tts.py:215-218)
    d = proc_duration(jnp.asarray([[0.0, 0.4, 2.6, 1.2]]), 1, min_frame_num=2)
    assert list(np.asarray(d[0])) == [0.0, 0.0, 3.0, 2.0]


def test_fastspeech2_train_and_infer():
    cfg = FastSpeech2Config(
        vocab_size=30,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01, return_energy=True),
        feat_norm=FeatNormConfig(feat_dim=20),
        pitch_norm=FeatNormConfig(feat_dim=1),
        energy_norm=FeatNormConfig(feat_dim=1),
        enc_emb=dict(embedding_dim=D),
        enc_prenet=dict(conv_dims=[D], conv_kernel=5, lnr_dims=-1),
        encoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64),
        duration_predictor=dict(conv_dims=[D, D]),
        pitch_predictor=dict(conv_dims=[D, D]),
        energy_predictor=dict(conv_dims=[D, D]),
        decoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64),
        postnet=dict(conv_dims=[D], conv_kernel=5),
        spk_emb=dict(spk_num=4, spk_emb_comb="add"),
    )
    net = FastSpeech2Net(cfg=cfg)
    B, L, Twav = 2, 6, 8000
    text = jax.random.randint(RNG, (B, L), 1, 29)
    text_len = jnp.array([6, 5])
    wave = jax.random.normal(RNG, (B, Twav, 1)) * 0.1
    wave_len = jnp.array([8000, 7000])
    pitch = jnp.abs(jax.random.normal(RNG, (B, 101))) * 200
    pitch_len = jnp.array([101, 88])
    dur = jnp.asarray(np.random.RandomState(1).randint(
        5, 25, (B, L)).astype(np.float32))
    spk = jnp.array([0, 2])
    variables = net.init({"params": RNG, "dropout": RNG}, text, text_len,
                         wave, wave_len, pitch, pitch_len, dur, text_len,
                         spk_ids=spk, train=False)
    out, muts = net.apply(variables, text, text_len, wave, wave_len, pitch,
                          pitch_len, dur, text_len, spk_ids=spk, train=True,
                          epoch=jnp.asarray(1), rngs={"dropout": RNG},
                          mutable=["norm_stats", "batch_stats"])
    loss, metrics = fastspeech2_loss(out, dur, cfg)
    assert np.isfinite(float(loss))
    assert out["pred_after"].shape == out["tgt_feat"].shape

    # inference: predicted durations, static frame cap, controllable alpha
    inf = net.apply({**variables, **muts}, text, text_len, spk_ids=spk,
                    train=False, max_frames=64,
                    duration_alpha=jnp.full((B, L), 1.2),
                    rngs={"dropout": RNG})
    assert inf["pred_after"].shape == (B, 64, 20)
    assert np.isfinite(np.asarray(inf["pred_after"])).all()


def test_griffin_lim_roundtrip():
    cfg = FrontendConfig(n_mels=80, sr=16000, win_length=0.05,
                         hop_length=0.0125)
    sr = 16000
    t = np.arange(sr) / sr
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)[None]
    fe = LogMelFrontend(cfg)
    mel, mel_len = fe(jnp.asarray(wave), jnp.array([sr]))
    rec_wave, rec_len = G.logmel_to_wave(mel, mel_len, cfg, n_iter=32)
    mel2, _ = fe(rec_wave, jnp.array([sr]))
    T = int(mel_len[0]) - 4
    m1, m2 = np.asarray(mel[0, :T]), np.asarray(mel2[0, :T])
    strong = m1 > m1.max() - 3  # within 3 decades of the peak
    # energy-carrying bins reconstructed to within mel-pinv smearing limits
    assert np.abs(m1[strong] - m2[strong]).mean() < 0.5
    rms1 = float(np.sqrt((wave ** 2).mean()))
    rms2 = float(jnp.sqrt((rec_wave ** 2).mean()))
    assert abs(rms1 - rms2) / rms1 < 0.25


def test_istft_is_exact_inverse():
    cfg = FrontendConfig(n_mels=80, sr=16000, win_length=0.05,
                         hop_length=0.0125)
    from speechain_tpu.ops.frontend import hann_window
    window = jnp.asarray(hann_window(cfg.win))
    wave = jnp.asarray(np.random.RandomState(0).randn(2, 8000)
                       .astype(np.float32))
    spec = G._stft(wave, window, cfg.fft, cfg.hop)
    rec = G._istft(spec, window, cfg.fft, cfg.hop, 8000)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(wave), atol=1e-5)


def test_griffin_lim_tone_identity():
    """The NNLS mel inversion must keep 220 Hz-spaced pure tones on
    frequency through a full mel->wave roundtrip. The reference's
    pinv-only inversion (linear2mel.py:191-224) smears each tone across
    its mel filter's triangle and renders ~40% of tones as a neighboring
    220 Hz step (measured on the chain-gate corpus); this test pins the
    fix (ops/griffin_lim.py `_nnls_linear`)."""
    cfg = FrontendConfig(sr=8000, n_mels=40, fmax=4000.0, win_length=0.02,
                         hop_length=0.01)
    sr = 8000
    freqs = 350.0 + 220.0 * np.arange(8)
    t = np.arange(1200) / sr
    wave = np.concatenate(
        [0.7 * np.sin(2 * np.pi * f * t) for f in freqs]
    ).astype(np.float32)[None]
    fe = LogMelFrontend(cfg)
    mel, mel_len = fe(jnp.asarray(wave), jnp.array([wave.shape[1]]))
    rec, rec_len = G.logmel_to_wave(mel, mel_len, cfg, n_iter=16)
    rec = np.clip(np.asarray(rec[0]), -1.0, 1.0)
    win, hop = 400, 80
    hann = np.hanning(win)
    seg = 1200  # samples per tone
    ok = tot = 0
    for i, f_true in enumerate(freqs):
        # measure segment interiors (skip 1 window of boundary bleed)
        for s in range(i * seg + win, (i + 1) * seg - win, hop):
            fr = rec[s:s + win] * hann
            f_peak = np.argmax(np.abs(np.fft.rfft(fr))) * sr / win
            ok += int(np.argmin(np.abs(freqs - f_peak)) == i)
            tot += 1
    assert tot > 0 and ok / tot >= 0.95, f"tone identity {ok}/{tot}"
