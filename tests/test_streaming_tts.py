"""Streaming vocoder (infer/streaming_tts.py): chunked HiFi-GAN synthesis
must emit EXACTLY the offline waveform — overlap-and-crop with the
analytic receptive-field margin, window edges coinciding with global
edges. Plus a lesion: an insufficient margin must break equality (the
test can fail)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.infer.streaming_tts import (StreamingVocoder,
                                               vocoder_margin_frames)
from speechain_tpu.nn.vocoder_hifigan import HiFiGAN

pytestmark = pytest.mark.slow

SMALL = dict(
    in_channels=12,
    resblock_type="1",
    resblock_dilation_sizes=((1, 3), (1, 3, 5)),
    resblock_kernel_sizes=(3, 7),
    upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=32,
    upsample_factors=(4, 4),
)


def _small_vocoder(seed=0):
    net = HiFiGAN(**SMALL)
    mel = jax.random.normal(jax.random.PRNGKey(seed), (2, 16, 12))
    variables = net.init(jax.random.PRNGKey(seed + 1), mel)
    return net, variables


def test_margin_default_config_sane():
    m = vocoder_margin_frames(None)
    assert 10 <= m <= 30
    # the SMALL test config upsamples less (u=4,16), so its resblock cones
    # cover MORE mel frames — margin slightly larger despite smaller kernels
    assert 10 <= vocoder_margin_frames(SMALL) <= 30


def test_streamed_equals_offline():
    net, variables = _small_vocoder()
    mel = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (2, 123, 12)))
    offline = np.asarray(net.apply(variables, jnp.asarray(mel)))

    voc = StreamingVocoder(net, variables, chunk_frames=16)
    chunks = list(voc.stream(mel))
    U = int(np.prod(SMALL["upsample_factors"]))
    assert all(c.shape[1] == 16 * U for c in chunks[:-1])
    got = np.concatenate(chunks, axis=1)
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, offline, atol=1e-5)
    # the callable form is the same path
    np.testing.assert_allclose(voc(mel), offline, atol=1e-5)


def test_short_mel_single_dispatch():
    net, variables = _small_vocoder()
    voc = StreamingVocoder(net, variables, chunk_frames=16)
    mel = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                       (1, voc.W - 3, 12)))
    offline = np.asarray(net.apply(variables, jnp.asarray(mel)))
    chunks = list(voc.stream(mel))
    assert len(chunks) == 1
    np.testing.assert_allclose(chunks[0], offline, atol=1e-5)


def test_incremental_push_finish_equals_offline():
    """Mel arrives in ragged pieces (an AR-TTS producer): push/finish
    must emit the same exact stream, and the first audio must come out
    before the stream ends."""
    net, variables = _small_vocoder()
    mel = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (1, 97, 12)))
    offline = np.asarray(net.apply(variables, jnp.asarray(mel)))

    voc = StreamingVocoder(net, variables, chunk_frames=8)
    out, early = [], False
    pieces = np.split(mel, [5, 17, 40, 41, 80], axis=1)
    for i, piece in enumerate(pieces):
        got = list(voc.push(piece))
        out.extend(got)
        if got and i < len(pieces) - 1:
            early = True
    out.extend(voc.finish())
    np.testing.assert_allclose(np.concatenate(out, axis=1), offline,
                               atol=1e-5)
    assert early, "no chunk emitted before the final mel piece"
    # the instance reset: a second stream through the same object works
    np.testing.assert_allclose(voc(mel), offline, atol=1e-5)


def test_insufficient_margin_breaks_equality():
    """Lesion: margin_frames=1 is far below the receptive field — the
    streamed output must then DIFFER from offline, proving the exactness
    tests above actually bite."""
    net, variables = _small_vocoder()
    mel = np.asarray(jax.random.normal(jax.random.PRNGKey(11), (1, 123, 12)))
    offline = np.asarray(net.apply(variables, jnp.asarray(mel)))
    voc = StreamingVocoder(net, variables, chunk_frames=16, margin_frames=1)
    got = np.concatenate(list(voc.stream(mel)), axis=1)
    assert not np.allclose(got, offline, atol=1e-4)


def _tiny_artts():
    from tests.test_tts import _artts_cfg

    from speechain_tpu.models.ar_tts import ARTTSNet
    cfg = _artts_cfg(enc_prenet=None, att_guid_sigma=0.0, spk_emb=None)
    net = ARTTSNet(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (2, 7), 1, 29)
    text_len = jnp.array([7, 5])
    wave = jax.random.normal(rng, (2, 8000, 1)) * 0.1
    wl = jnp.array([8000, 8000])
    variables = net.init({"params": rng, "dropout": rng}, text, text_len,
                         wave, wl, train=False)
    return net, variables, text, text_len


def test_streaming_artts_equals_offline():
    """The ticked AR decode must emit EXACTLY the offline
    tts_auto_regression mel (same rng, caps, stop bookkeeping), including
    a tick size that does not divide the frame budget."""
    from speechain_tpu.infer.streaming_tts import StreamingARTTS
    from speechain_tpu.infer.tts_decoding import tts_auto_regression

    net, variables, text, text_len = _tiny_artts()
    F = 20
    off = tts_auto_regression(net, variables, text, text_len,
                              max_frames=F, maxlen_ratio=4.0)

    tts = StreamingARTTS(net, variables, frames_per_tick=3, max_frames=F,
                         maxlen_ratio=4.0)
    got, hypo_len = [], None
    for out in tts.synthesize(text, text_len):
        got.append(out["mel"])
        hypo_len = out["hypo_len"]
    mel = np.concatenate(got, axis=1)
    offline = np.asarray(off["hypo_feat"])
    off_len = np.asarray(off["hypo_feat_len"])
    np.testing.assert_array_equal(hypo_len, off_len)
    # offline returns the full F*r zero-padded buffer; the stream stops as
    # soon as every row raised its flag — compare each row's valid region
    # and require zeros beyond it on both sides
    for b in range(mel.shape[0]):
        L = int(off_len[b])
        assert mel.shape[1] >= L
        # scan vs while_loop compile to differently fused f32 kernels;
        # equality is to fusion-rounding tolerance, not bit-exact
        np.testing.assert_allclose(mel[b, :L], offline[b, :L], atol=1e-4)
        assert (mel[b, L:] == 0).all() and (offline[b, L:] == 0).all()


def test_streaming_artts_audio_pipe():
    """Text -> audio: ticked AR mel pushed through the streaming vocoder
    must equal offline decode + offline vocoding of the valid mel."""
    from speechain_tpu.infer.streaming_tts import (StreamingARTTS,
                                                   StreamingVocoder)
    from speechain_tpu.infer.tts_decoding import tts_auto_regression
    from speechain_tpu.nn.vocoder_hifigan import HiFiGAN

    net, variables, text, text_len = _tiny_artts()
    text, text_len = text[:1], text_len[:1]
    F = 20
    voc_net = HiFiGAN(in_channels=20,
                      resblock_dilation_sizes=((1, 3), (1, 3)),
                      resblock_kernel_sizes=(3, 5),
                      upsample_kernel_sizes=(8, 4),
                      upsample_initial_channel=16,
                      upsample_factors=(4, 2))
    voc_vars = voc_net.init(jax.random.PRNGKey(5),
                            jnp.zeros((1, 8, 20)))

    off = tts_auto_regression(net, variables, text, text_len,
                              max_frames=F, maxlen_ratio=4.0)
    L = int(off["hypo_feat_len"][0])
    offline_wave = np.asarray(voc_net.apply(
        voc_vars, off["hypo_feat"][:, :L]))

    tts = StreamingARTTS(net, variables, frames_per_tick=4, max_frames=F,
                         maxlen_ratio=4.0)
    voc = StreamingVocoder(voc_net, voc_vars, chunk_frames=6)
    chunks = list(tts.synthesize_audio(voc, text, text_len))
    wave = np.concatenate(chunks, axis=1)
    assert wave.shape == offline_wave.shape
    np.testing.assert_allclose(wave, offline_wave, atol=1e-5)


def test_streaming_tts_int8_serving():
    """weight_quant='int8' on both TTS streaming surfaces: the int8
    streamed output must equal the int8 OFFLINE output (dequantized
    weights), and differ from fp32 (the quantization actually bit)."""
    from speechain_tpu.infer.quantize import (dequantize_variables,
                                              quantize_variables)

    net, variables = _small_vocoder()
    mel = np.asarray(jax.random.normal(jax.random.PRNGKey(13),
                                       (1, 100, 12)))
    q = quantize_variables(variables, min_elems=256)
    off_q = np.asarray(net.apply(dequantize_variables(q), jnp.asarray(mel)))
    off_fp = np.asarray(net.apply(variables, jnp.asarray(mel)))
    assert not np.allclose(off_q, off_fp, atol=1e-6)

    voc = StreamingVocoder(net, variables, chunk_frames=16,
                           weight_quant="int8", wq_min_elems=256)
    np.testing.assert_allclose(voc(mel), off_q, atol=1e-5)

    # AR-TTS ticks under int8: runs and matches its own offline-int8 decode
    from speechain_tpu.infer.streaming_tts import StreamingARTTS
    from speechain_tpu.infer.tts_decoding import tts_auto_regression
    anet, avars, text, text_len = _tiny_artts()
    aq = quantize_variables(avars, min_elems=256)
    off = tts_auto_regression(anet, dequantize_variables(aq), text,
                              text_len, max_frames=12, maxlen_ratio=4.0)
    tts = StreamingARTTS(anet, avars, frames_per_tick=4, max_frames=12,
                         maxlen_ratio=4.0, weight_quant="int8",
                         wq_min_elems=256)
    got, hl = [], None
    for out in tts.synthesize(text, text_len):
        got.append(out["mel"]); hl = out["hypo_len"]
    mel_s = np.concatenate(got, axis=1)
    off_len = np.asarray(off["hypo_feat_len"])
    np.testing.assert_array_equal(hl, off_len)
    for b in range(mel_s.shape[0]):
        L = int(off_len[b])
        np.testing.assert_allclose(mel_s[b, :L],
                                   np.asarray(off["hypo_feat"])[b, :L],
                                   atol=1e-4)
