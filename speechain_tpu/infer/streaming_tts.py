"""Streaming TTS synthesis: chunked HiFi-GAN vocoding, exact.

The serving recipe behind low first-audio latency: the acoustic model
(FastSpeech2 in one dispatch, or the AR-TTS decoder frame-by-frame)
produces log-mel, and the vocoder turns it into waveform INCREMENTALLY —
one fixed-shape dispatch per chunk — instead of waiting for the whole
utterance. The reference vocodes whole utterances only
(reference module/vocoder/hifigan.py:305-397).

Exactness (stream == offline, no fades or overlap-add) comes from
overlap-and-crop: HiFi-GAN is a pure feed-forward conv stack, so every
output sample depends on a bounded cone of mel frames.
:func:`vocoder_margin_frames` bounds that cone's radius M analytically
from the generator config; each chunk of C mel frames is vocoded from a
window of C + 2M frames and the M-frame margins are cropped on device.
Window edges that coincide with the global sequence edges reproduce the
offline SAME-padding behavior exactly, interior edges are cropped beyond
the receptive field — so every emitted sample equals the offline one.

TPU notes: all windows share ONE compiled executable (static shapes); the
margin work is the only overhead (2M / (C + 2M) redundant frames — ~30%
at C=40 for the default generator, amortize with bigger C when latency
allows).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def vocoder_margin_frames(config: Optional[Dict] = None) -> int:
    """Receptive-field radius of the HiFi-GAN generator in MEL frames
    (conservative upper bound).

    Walks the stack, accumulating each layer's half-kernel cone converted
    back to mel frames by the cumulative upsample factor ``u``:
    conv_pre (k=7 SAME) contributes 3; each ConvTranspose(k, stride=f)
    contributes <= k/u output-rate taps; each MRF stage the widest of its
    parallel resblocks (sum of its dilated-conv radii — they compose
    serially inside a block); conv_post 3/u. The default SpeechBrain
    config lands at ~15 -> margin 16.
    """
    from speechain_tpu.nn.vocoder_hifigan import HIFIGAN_DEFAULT_CONFIG
    cfg = {**HIFIGAN_DEFAULT_CONFIG, **(config or {})}
    m = 3.0                          # conv_pre, mel rate
    u = 1
    for f, k in zip(cfg["upsample_factors"], cfg["upsample_kernel_sizes"]):
        u *= f
        m += k / u                   # ConvTranspose cone
        widest = 0
        for rk, rd in zip(cfg["resblock_kernel_sizes"],
                          cfg["resblock_dilation_sizes"]):
            if cfg["resblock_type"] == "1":
                rad = sum(d * (rk - 1) // 2 + (rk - 1) // 2 for d in rd)
            else:
                rad = sum(d * (rk - 1) // 2 for d in rd)
            widest = max(widest, rad)
        m += widest / u
    m += 3 / u                       # conv_post
    return int(math.ceil(m)) + 1


class StreamingVocoder:
    """Exact chunked vocoding of a HiFi-GAN generator.

    ``stream(mel)`` yields waveform chunks of ``chunk_frames * U`` samples
    (U = prod(upsample_factors)); their concatenation equals
    ``net.apply(variables, mel)``. ``push``/``finish`` give the
    incremental form for producers that emit mel as it is synthesized
    (AR-TTS decoding, a chained FS2): audio starts after
    ``chunk_frames + 2 * margin_frames`` mel frames instead of the whole
    utterance.
    """

    def __init__(self, net, variables: Dict, *, chunk_frames: int = 40,
                 margin_frames: Optional[int] = None):
        self.net = net
        self.variables = variables
        cfg = dict(
            upsample_factors=net.upsample_factors,
            upsample_kernel_sizes=net.upsample_kernel_sizes,
            resblock_kernel_sizes=net.resblock_kernel_sizes,
            resblock_dilation_sizes=net.resblock_dilation_sizes,
            resblock_type=net.resblock_type,
        )
        self.U = int(np.prod(net.upsample_factors))
        self.C = int(chunk_frames)
        self.M = int(margin_frames if margin_frames is not None
                     else vocoder_margin_frames(cfg))
        self.W = self.C + 2 * self.M
        self._buf: Optional[np.ndarray] = None   # incremental mel buffer
        self._emitted = 0                        # frames already vocoded

        def tick(variables, mel_win, off):
            wave = net.apply(variables, mel_win)     # (B, W*U)
            return jax.lax.dynamic_slice_in_dim(wave, off, self.C * self.U,
                                                axis=1)

        self._tick = jax.jit(tick)
        self._offline = jax.jit(lambda v, m: net.apply(v, m))

    def _chunk(self, mel: np.ndarray, s: int, e: int, T: int) -> np.ndarray:
        """Exact waveform for mel frames [s, e) of a (B, T, D) mel with
        T > W. The device slice has fixed size C*U; for the end-clamped
        final chunk the window remainder can be shorter, so the device
        slice starts earlier (dynamic_slice clamps) and the true offset is
        restored by a host-side crop."""
        w0 = min(max(s - self.M, 0), T - self.W)
        dev_off = min(s - w0, self.W - self.C)    # what dynamic_slice uses
        out = np.asarray(self._tick(
            self.variables, jnp.asarray(mel[:, w0:w0 + self.W]),
            jnp.asarray(dev_off * self.U, jnp.int32)))
        skip = (s - w0 - dev_off) * self.U
        return out[:, skip:skip + (e - s) * self.U]

    # ----------------------------------------------------- whole-mel form
    def stream(self, mel) -> Iterator[np.ndarray]:
        """Yield exact waveform chunks for a complete (B, T, n_mels) mel.
        All chunks are ``C * U`` samples except a shorter final one."""
        mel = np.asarray(mel)
        B, T = mel.shape[0], mel.shape[1]
        if T <= self.W:
            # shorter than one window: a single offline dispatch IS the
            # stream (and the only exact option — no interior to crop)
            yield np.asarray(self._offline(self.variables, jnp.asarray(mel)))
            return
        for s in range(0, T, self.C):
            yield self._chunk(mel, s, min(s + self.C, T), T)

    def __call__(self, mel) -> np.ndarray:
        """Full waveform via the streaming path (concat of stream())."""
        return np.concatenate(list(self.stream(mel)), axis=1)

    # ----------------------------------------------------- incremental
    def push(self, mel_frames) -> Iterator[np.ndarray]:
        """Feed newly produced mel frames (B, t, n_mels); yields every
        chunk whose window is fully covered by the buffered frames."""
        mel_frames = np.asarray(mel_frames)
        self._buf = (mel_frames if self._buf is None
                     else np.concatenate([self._buf, mel_frames], axis=1))
        while self._buf.shape[1] >= max(self._emitted + self.C + self.M,
                                        self.W):
            s = self._emitted
            w0 = max(s - self.M, 0)
            # interior windows only here: the right margin M is covered
            # (finish() handles end-clamped windows once T is known)
            if w0 + self.W > self._buf.shape[1]:
                break
            out = self._tick(
                self.variables,
                jnp.asarray(self._buf[:, w0:w0 + self.W]),
                jnp.asarray((s - w0) * self.U, jnp.int32))
            self._emitted = s + self.C
            yield np.asarray(out)

    def finish(self) -> Iterator[np.ndarray]:
        """The stream is complete: emit all remaining chunks (end-clamped
        windows, exact), then reset for the next stream."""
        buf, self._buf = self._buf, None
        emitted, self._emitted = self._emitted, 0
        if buf is None:
            return
        T = buf.shape[1]
        if T <= self.W:
            assert emitted == 0
            yield np.asarray(self._offline(self.variables, jnp.asarray(buf)))
            return
        for s in range(emitted, T, self.C):
            yield self._chunk(buf, s, min(s + self.C, T), T)
