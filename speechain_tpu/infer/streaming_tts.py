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


def _maybe_quantize(variables: Dict, weight_quant: Optional[str],
                    min_elems: int) -> Dict:
    """int8 weight-only serving (infer/quantize.py): quantize at build,
    dequantize inside every jitted executable (XLA fuses the
    convert+multiply into the consumers). Identity when off."""
    if not weight_quant:
        return variables
    assert str(weight_quant).lower() == "int8", \
        f"weight_quant must be 'int8', got {weight_quant!r}"
    from speechain_tpu.infer.quantize import quantize_variables
    return quantize_variables(variables, min_elems=min_elems)


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
                 margin_frames: Optional[int] = None,
                 weight_quant: Optional[str] = None,
                 wq_min_elems: int = 8192):
        self.net = net
        self.variables = _maybe_quantize(variables, weight_quant,
                                         wq_min_elems)
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

        from speechain_tpu.infer.quantize import dequantize_variables

        def tick(variables, mel_win, off):
            wave = net.apply(dequantize_variables(variables), mel_win)
            return jax.lax.dynamic_slice_in_dim(wave, off, self.C * self.U,
                                                axis=1)

        self._tick = jax.jit(tick)
        self._offline = jax.jit(
            lambda v, m: net.apply(dequantize_variables(v), m))

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


class StreamingARTTS:
    """Incremental AR-TTS synthesis: the autoregressive decode loop runs
    in jitted ticks of ``frames_per_tick`` steps instead of one monolithic
    ``lax.while_loop``, yielding each tick's newly generated mel frames —
    chain into :class:`StreamingVocoder`'s ``push`` for text -> audio
    streaming (first audio long before the utterance finishes decoding).

    Exactness: each tick's step replicates
    ``infer/tts_decoding.py::tts_auto_regression``'s loop body (stop-point
    bookkeeping, per-utterance caps, postnet-in-the-loop feedback,
    inference-time prenet dropout keyed by the absolute step), and steps
    past all-stopped are no-ops on the emitted buffer — the streamed mel
    and lengths equal the offline decode (to f32 fusion-rounding
    tolerance: scan and while_loop compile to differently fused kernels;
    tests/test_streaming_tts.py).
    """

    def __init__(self, net, variables: Dict, *, frames_per_tick: int = 8,
                 stop_threshold: float = 0.5, maxlen_ratio: float = 10.0,
                 continual_steps: int = 0, use_before: bool = False,
                 max_frames: int = 256, rng=None,
                 weight_quant: Optional[str] = None,
                 wq_min_elems: int = 8192):
        self.net = net
        self.variables = _maybe_quantize(variables, weight_quant,
                                         wq_min_elems)
        c = net.cfg
        self.r = c.reduction_factor
        self.n_mels = c.frontend.n_mels
        self.feat_dim = self.n_mels * self.r
        self.K = int(frames_per_tick)
        self.F = int(max_frames)
        self.maxlen_ratio = float(maxlen_ratio)
        self.continual_steps = int(continual_steps)
        self.use_before = bool(use_before)
        self.rng = jax.random.PRNGKey(0) if rng is None else rng
        self.logits_threshold = -math.log(1.0 / stop_threshold - 1.0)
        self._prepare_j = jax.jit(self._prepare)
        self._tick_j = jax.jit(self._tick, donate_argnums=(7,))

    def _prepare(self, variables, text, text_len, spk_feat, spk_ids, rng):
        from speechain_tpu.infer.quantize import dequantize_variables
        net = self.net
        variables = dequantize_variables(variables)
        base = {k: v for k, v in variables.items() if k != "cache"}
        enc_text, enc_mask = net.apply(base, text, text_len,
                                       spk_feat=spk_feat, spk_ids=spk_ids,
                                       method=net.encode_text)
        B = text.shape[0]
        zero_frame = jnp.zeros((B, 1, self.feat_dim), jnp.float32)
        _, primed = net.apply(
            base, zero_frame, enc_text, enc_mask, spk_feat=spk_feat,
            spk_ids=spk_ids, prime=True, cache_capacity=self.F,
            method=net.decode_step, mutable=["cache"],
            rngs={"dropout": rng})
        return enc_text, enc_mask, primed["cache"]

    def _tick(self, variables, enc_text, enc_mask, spk_feat, spk_ids,
              text_len, rng, carry):
        from speechain_tpu.infer.quantize import dequantize_variables
        net, B, F = self.net, enc_text.shape[0], self.F
        variables = dequantize_variables(variables)
        base = {k: v for k, v in variables.items() if k != "cache"}
        per_utt_cap = (text_len.astype(jnp.float32) * self.maxlen_ratio
                       / self.r + 1)

        def one(s, _):
            # mirror of tts_auto_regression's while body (tts_decoding.py)
            (step, cache, before_buf, out_buf, last, stop_points, flags,
             hlen) = s
            (stop, before), upd = net.apply(
                {**base, "cache": cache}, last, enc_text, enc_mask,
                spk_feat=spk_feat, spk_ids=spk_ids, method=net.decode_step,
                mutable=["cache"],
                rngs={"dropout": jax.random.fold_in(rng, step)})
            cache = upd["cache"]
            before_buf = jax.lax.dynamic_update_slice(
                before_buf, before, (0, step, 0))
            if self.use_before:
                frame = before
            else:
                after_buf = net.apply(base, before_buf,
                                      method=net.apply_postnet)
                frame = jax.lax.dynamic_slice(
                    after_buf, (0, step, 0), (B, 1, self.feat_dim))
            frame = jnp.where(flags[:, None, None], 0.0, frame)
            out_buf = jax.lax.dynamic_update_slice(out_buf, frame,
                                                   (0, step, 0))
            hlen = jnp.where(flags, hlen, hlen + 1)
            curr = step + 2
            fired = stop[:, -1] > self.logits_threshold
            stop_points = jnp.where(fired & (stop_points == 0), curr,
                                    stop_points)
            flags = ((stop_points != 0)
                     & (curr >= stop_points + self.continual_steps)) | (
                hlen.astype(jnp.float32) >= per_utt_cap - 1)
            return (step + 1, cache, before_buf, out_buf, frame,
                    stop_points, flags, hlen), None

        start = carry[0]
        carry, _ = jax.lax.scan(one, carry, None, length=self.K)
        frames = jax.lax.dynamic_slice(carry[3], (0, start, 0),
                                       (B, self.K, self.feat_dim))
        return carry, frames, carry[6], carry[7]

    def synthesize(self, text, text_len, spk_feat=None, spk_ids=None):
        """Generator of per-tick dicts: ``mel`` (B, K*r, n_mels) — the
        tick's newly generated frames, ``start`` (global mel-frame index
        of mel[:, 0]), ``hypo_len`` (B,) valid mel frames so far, and
        ``done``. Total steps never exceed ``max_frames``."""
        text = jnp.asarray(text)
        text_len = jnp.asarray(text_len, jnp.int32)
        B = text.shape[0]
        enc_text, enc_mask, cache = self._prepare_j(
            self.variables, text, text_len, spk_feat, spk_ids, self.rng)
        carry = (jnp.zeros((), jnp.int32), cache,
                 jnp.zeros((B, self.F, self.feat_dim)),
                 jnp.zeros((B, self.F, self.feat_dim)),
                 jnp.zeros((B, 1, self.feat_dim), jnp.float32),
                 jnp.zeros((B,), jnp.int32),
                 jnp.zeros((B,), bool),
                 jnp.zeros((B,), jnp.int32))
        steps = 0
        while True:
            start = steps
            carry, frames, flags, hlen = self._tick_j(
                self.variables, enc_text, enc_mask, spk_feat, spk_ids,
                text_len, self.rng, carry)
            steps += self.K
            done = bool(np.asarray(flags).all()) or steps >= self.F
            mel = np.asarray(frames).reshape(B, self.K * self.r,
                                             self.n_mels)
            yield dict(mel=mel, start=start * self.r,
                       hypo_len=np.asarray(hlen) * self.r, done=done)
            if done:
                return

    def synthesize_audio(self, vocoder: StreamingVocoder, text, text_len,
                         spk_feat=None, spk_ids=None):
        """Text -> audio streaming for ONE utterance (B=1): pipes each
        tick's valid new mel frames into ``vocoder.push`` and yields wave
        chunks as they become computable. The concatenated audio equals
        vocoding the offline decode's valid mel."""
        assert int(jnp.asarray(text).shape[0]) == 1, \
            "synthesize_audio streams a single utterance (B=1)"
        pushed = 0
        for out in self.synthesize(text, text_len, spk_feat=spk_feat,
                                   spk_ids=spk_ids):
            valid = int(out["hypo_len"][0])
            take = max(0, min(valid - pushed, out["mel"].shape[1]))
            if take:
                yield from vocoder.push(out["mel"][:, :take])
                pushed += take
        yield from vocoder.finish()
