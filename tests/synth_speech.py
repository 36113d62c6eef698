"""Formant-style synthetic speech for the quality tier (VERDICT r2 item 8).

Pure tones made the old quality gate nearly linearly separable; these
utterances are speech-shaped enough that the gated pipeline components are
load-bearing:

- each of the 8 "phonemes" is a 3-formant spectral envelope excited by a
  harmonic source, so classification needs the formant PATTERN, not a
  single frequency;
- 4 "speakers" differ in f0 (115-255 Hz), vocal-tract length (formants
  scaled 0.93-1.15x), channel gain (0.05-4x) and spectral tilt — pitch and
  speaker identity are nuisance variables the model must factor out, and
  the per-speaker gain/tilt makes GROUP-mode feature normalization
  load-bearing (scrambled group ids mis-normalize by up to log(80) in
  log-mel space);
- per-utterance pitch jitter + vibrato, per-token duration jitter,
  variable token counts (3-6) -> real length variation (attention-mask
  load-bearing), additive noise at 18 dB SNR.

Used by tests/test_quality_regression.py (in-memory batches) and the
speech-chain closure gate (on-disk corpus via :func:`write_formant_corpus`).
"""

from __future__ import annotations

import os

import numpy as np

SR = 16000
TOKENS = "abcdefgh"

# vowel-like (F1, F2, F3) in Hz — 8 well-separated patterns
PHONES = np.array([
    (730, 1090, 2440),
    (270, 2290, 3010),
    (300, 870, 2240),
    (530, 1840, 2480),
    (660, 1700, 2400),
    (490, 1350, 1690),
    (390, 1990, 2550),
    (570, 840, 2410),
], np.float32)

# speakers: (f0 base, vtln factor, linear gain, spectral tilt exponent)
SPEAKERS = [
    (115.0, 0.93, 0.05, -0.6),
    (150.0, 1.00, 0.30, -0.2),
    (205.0, 1.07, 1.00, +0.2),
    (255.0, 1.15, 4.00, +0.6),
]

_BW = 120.0          # formant bandwidth (Hz)
_TOK_SEC = 0.11      # nominal per-token duration


def _formant_amp(freqs: np.ndarray, phone: int, vtln: float,
                 tilt: float) -> np.ndarray:
    """Harmonic amplitudes from the phone's formant envelope."""
    centers = PHONES[phone] * vtln
    amp = np.zeros_like(freqs)
    for c in centers:
        amp += 1.0 / (1.0 + ((freqs - c) / _BW) ** 2)
    amp *= (np.maximum(freqs, 100.0) / 500.0) ** tilt      # channel tilt
    return amp


def synth_utterance(tokens, speaker: int, rs: np.random.RandomState,
                    sr: int = SR) -> np.ndarray:
    """Tokens (ints 0..7) -> waveform for the given speaker."""
    f0_base, vtln, gain, tilt = SPEAKERS[speaker]
    f0 = f0_base * rs.uniform(0.92, 1.08)
    pieces = []
    for tok in tokens:
        n = int(sr * _TOK_SEC * rs.uniform(0.8, 1.3))
        t = np.arange(n) / sr
        # mild vibrato so pitch is not a constant
        inst_f0 = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 5.0 * t
                                            + rs.uniform(0, 6.28)))
        phase0 = rs.uniform(0, 2 * np.pi)
        phase = 2 * np.pi * np.cumsum(inst_f0) / sr + phase0
        n_harm = int(4000.0 / f0)
        ks = np.arange(1, n_harm + 1, dtype=np.float32)
        amps = _formant_amp(ks * f0, int(tok), vtln, tilt)
        sig = (np.sin(phase[:, None] * ks[None, :])
               * amps[None, :]).sum(axis=1)
        # 10 ms raised-cosine edges: no hard discontinuities, no silence
        edge = min(int(0.010 * sr), n // 2)
        env = np.ones(n, np.float32)
        ramp = 0.5 - 0.5 * np.cos(np.linspace(0, np.pi, edge))
        env[:edge], env[-edge:] = ramp, ramp[::-1]
        pieces.append(sig * env)
    wav = np.concatenate(pieces).astype(np.float32)
    wav /= max(np.abs(wav).max(), 1e-6)
    noise = rs.standard_normal(len(wav)).astype(np.float32)
    snr = 10.0 ** (18.0 / 20.0)
    wav = wav + noise * (np.sqrt(np.mean(wav ** 2)) / snr)
    return (gain * wav).astype(np.float32)


def make_formant_batch(rs: np.random.RandomState, B: int = 16,
                       vocab_offset: int = 3, sos_eos: int = 11,
                       n_tok_range=(3, 7), time_bucket: int = 2048):
    """In-memory batch dict (feat/feat_len/text/text_len/group_ids/epoch)
    with variable lengths padded to a bucket grid.

    Token ids: 0..7 -> vocab ids vocab_offset..vocab_offset+7 (blank/unk
    reserved below), <sos/eos> = ``sos_eos``. group_ids = speaker index.
    """
    import jax.numpy as jnp

    utts, texts, spks = [], [], []
    for b in range(B):
        n_tok = int(rs.randint(*n_tok_range))
        toks = rs.randint(0, len(PHONES), size=n_tok)
        for i in range(1, n_tok):      # no adjacent repeats (unsolvable)
            if toks[i] == toks[i - 1]:
                toks[i] = (toks[i] + 1) % len(PHONES)
        spk = int(rs.randint(0, len(SPEAKERS)))
        utts.append(synth_utterance(toks, spk, rs))
        texts.append(toks)
        spks.append(spk)
    T = max(len(u) for u in utts)
    T = ((T + time_bucket - 1) // time_bucket) * time_bucket
    L = max(len(t) for t in texts) + 2
    feat = np.zeros((B, T, 1), np.float32)
    feat_len = np.zeros((B,), np.int32)
    text = np.full((B, L), 0, np.int32)
    text_len = np.zeros((B,), np.int32)
    for b, (u, tk) in enumerate(zip(utts, texts)):
        feat[b, :len(u), 0] = u
        feat_len[b] = len(u)
        ids = [sos_eos] + [int(x) + vocab_offset for x in tk] + [sos_eos]
        text[b, :len(ids)] = ids
        text_len[b] = len(ids)
    return dict(feat=jnp.asarray(feat),
                feat_len=jnp.asarray(feat_len),
                text=jnp.asarray(text),
                text_len=jnp.asarray(text_len),
                group_ids=jnp.asarray(np.asarray(spks, np.int32)),
                epoch=jnp.zeros((), jnp.int32))


def write_formant_corpus(root: str, split_sizes, seed: int = 0,
                         sr: int = SR):
    """On-disk corpus in the framework's idx2* contract (wav/text/len +
    vocab), one subdir per split — the chain-closure gate's data."""
    import wave as wavemod

    rs = np.random.RandomState(seed)
    vocab = ["<blank>", "<unk>"] + list(TOKENS) + ["<sos/eos>"]
    os.makedirs(os.path.join(root, "token"), exist_ok=True)
    with open(os.path.join(root, "token", "vocab"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    for split, n in split_sizes.items():
        d = os.path.join(root, split)
        os.makedirs(os.path.join(d, "wav"), exist_ok=True)
        idx2wav, idx2text, idx2len = {}, {}, {}
        for i in range(n):
            n_tok = int(rs.randint(3, 7))
            toks = rs.randint(0, len(PHONES), size=n_tok)
            for j in range(1, n_tok):
                if toks[j] == toks[j - 1]:
                    toks[j] = (toks[j] + 1) % len(PHONES)
            spk = int(rs.randint(0, len(SPEAKERS)))
            wav = synth_utterance(toks, spk, rs, sr=sr)
            idx = f"{split}_{i:04d}"
            path = os.path.join(d, "wav", idx + ".wav")
            data = (np.clip(wav / max(np.abs(wav).max(), 1e-6), -1, 1)
                    * 32767).astype("<i2").tobytes()
            with wavemod.open(path, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(sr)
                f.writeframes(data)
            idx2wav[idx] = path
            idx2text[idx] = "".join(TOKENS[k] for k in toks)
            idx2len[idx] = len(wav)
        for name, data in [("idx2wav", idx2wav), ("idx2text", idx2text),
                           ("idx2wav_len", idx2len)]:
            with open(os.path.join(d, name), "w") as f:
                for k, v in data.items():
                    f.write(f"{k} {v}\n")
    return root
