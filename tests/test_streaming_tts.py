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
