"""TTS objective evaluation: MCD / MSD / log-F0 RMSE with DTW alignment.

Rebuild of reference ``recipes/tts/tts_evaluation.py:54-128`` +
``utilbox/feat_util.py`` extractors, dependency-free:
- MFCC = DCT-II over the log-Mel (librosa.feature.mfcc equivalent);
- DTW = exact O(T1*T2) DP (the reference uses fastdtw's approximation; exact
  DTW can only tighten the distance);
- F0 via autocorrelation with parabolic refinement (the reference uses
  pyworld dio+stonemask, unavailable here; both produce voiced-frame F0
  tracks — log-F0 RMSE compares voiced frames only, :116-128);
- MCD/MSD = (10/ln10)*sqrt(2) * mean frame Euclidean distance (:112-114).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from speechain_tpu.ops.frontend import FrontendConfig, LogMelFrontend


def wav_to_logmel(wave: np.ndarray, sr: int, n_mels: int = 80,
                  win_length: float = 0.05, hop_length: float = 0.0125
                  ) -> np.ndarray:
    import jax.numpy as jnp
    cfg = FrontendConfig(n_mels=n_mels, sr=sr, win_length=win_length,
                         hop_length=hop_length)
    fe = LogMelFrontend(cfg)
    feat, feat_len = fe(jnp.asarray(wave[None]),
                        jnp.asarray([len(wave)]))
    return np.asarray(feat[0][: int(feat_len[0])])


def wav_to_mfcc(wave: np.ndarray, sr: int, n_mfcc: int = 13,
                win_length: float = 0.05, hop_length: float = 0.0125
                ) -> np.ndarray:
    """MFCC via DCT-II on the log-Mel (feat_util.py mfcc path)."""
    logmel = wav_to_logmel(wave, sr, 80, win_length, hop_length)
    # librosa uses log-e mel in dB-like scaling; our logmel is log10 —
    # constant scale differences cancel in MCD's relative use, but keep
    # the standard 10*log10 power dB convention for comparability
    db = 10.0 * logmel
    M = db.shape[1]
    n = np.arange(M)
    dct = np.cos(np.pi / M * (n[None, :] + 0.5) * np.arange(n_mfcc)[:, None])
    dct *= np.sqrt(2.0 / M)
    dct[0] /= np.sqrt(2.0)
    return db @ dct.T                                       # (T, n_mfcc)


def wav_to_pitch(wave: np.ndarray, sr: int, hop_length: float = 0.0125,
                 fmin: float = 60.0, fmax: float = 400.0,
                 voicing_threshold: float = 0.3) -> np.ndarray:
    """Autocorrelation F0 with parabolic interpolation; 0 = unvoiced."""
    hop = int(hop_length * sr)
    win = int(0.05 * sr)
    lag_min = int(sr / fmax)
    lag_max = min(int(sr / fmin), win - 1)
    n_frames = max(0, (len(wave) - win) // hop + 1)
    f0 = np.zeros(n_frames)
    for i in range(n_frames):
        frame = wave[i * hop: i * hop + win].astype(np.float64)
        frame = frame - frame.mean()
        energy = (frame ** 2).sum()
        if energy < 1e-8:
            continue
        ac = np.correlate(frame, frame, mode="full")[win - 1:]
        ac = ac / ac[0]
        seg = ac[lag_min:lag_max]
        if len(seg) == 0:
            continue
        peak = int(np.argmax(seg)) + lag_min
        if ac[peak] < voicing_threshold:
            continue
        # parabolic refinement
        if 0 < peak < len(ac) - 1:
            a, b, c = ac[peak - 1], ac[peak], ac[peak + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            peak = peak + shift
        f0[i] = sr / peak
    return f0


def dtw_path(a: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact DTW over Euclidean frame distances; returns aligned index
    arrays (path_a, path_b)."""
    a2 = (a ** 2).sum(-1)[:, None] if a.ndim == 2 else (a ** 2)[:, None]
    b2 = (b ** 2).sum(-1)[None, :] if b.ndim == 2 else (b ** 2)[None, :]
    ab = a @ b.T if a.ndim == 2 else a[:, None] * b[None, :]
    dist = np.sqrt(np.maximum(a2 + b2 - 2 * ab, 0.0))
    T1, T2 = dist.shape
    acc = np.full((T1 + 1, T2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, T1 + 1):
        prev = np.minimum(acc[i - 1, :-1],
                          np.minimum(acc[i - 1, 1:], np.inf))
        # vectorized row update is tricky due to acc[i, j-1]; do it scalar
        for j in range(1, T2 + 1):
            acc[i, j] = dist[i - 1, j - 1] + min(
                acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
    # backtrace
    i, j = T1, T2
    pa, pb = [], []
    while i > 0 and j > 0:
        pa.append(i - 1)
        pb.append(j - 1)
        moves = [(acc[i - 1, j - 1], i - 1, j - 1),
                 (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1)]
        _, i, j = min(moves)
    pa.reverse()
    pb.reverse()
    return np.asarray(pa), np.asarray(pb)


MCD_COEFF = 10.0 / np.log(10.0) * np.sqrt(2.0)


def _too_short(*waves, sr) -> bool:
    # below one analysis window no frame exists (e.g. an untrained FS2
    # predicts all-zero durations -> empty synthesis); callers record the
    # utterance as unscoreable instead of crashing
    return any(len(np.reshape(w, -1)) < int(0.05 * sr) for w in waves)


def mcd(hypo_wave: np.ndarray, refer_wave: np.ndarray, sr: int
        ) -> Optional[float]:
    """Mel-cepstral distortion over DTW-aligned MFCC frames
    (tts_evaluation.py:89-114). None if either wave is too short."""
    if _too_short(hypo_wave, refer_wave, sr=sr):
        return None
    h = wav_to_mfcc(hypo_wave, sr)
    r = wav_to_mfcc(refer_wave, sr)
    pa, pb = dtw_path(h, r)
    return float(MCD_COEFF * np.mean(
        np.sqrt(((h[pa] - r[pb]) ** 2).sum(-1))))


def msd(hypo_wave: np.ndarray, refer_wave: np.ndarray, sr: int
        ) -> Optional[float]:
    """Mel-spectral distortion over DTW-aligned log-Mels. None if either
    wave is too short."""
    if _too_short(hypo_wave, refer_wave, sr=sr):
        return None
    h = wav_to_logmel(hypo_wave, sr)
    r = wav_to_logmel(refer_wave, sr)
    pa, pb = dtw_path(h, r)
    return float(MCD_COEFF * np.mean(
        np.sqrt(((h[pa] - r[pb]) ** 2).sum(-1))))


def log_f0_rmse(hypo_wave: np.ndarray, refer_wave: np.ndarray, sr: int
                ) -> Optional[float]:
    """RMSE of log-F0 over frames voiced in BOTH tracks
    (tts_evaluation.py:116-128). None if either wave is too short."""
    if _too_short(hypo_wave, refer_wave, sr=sr):
        return None
    # reference tts_evaluation.py uses pyworld convert_wav_to_pitch
    # (non-continuous) — same algorithm path here
    from speechain_tpu.utils.world_pitch import convert_wav_to_pitch
    h = convert_wav_to_pitch(hypo_wave, hop_length=256, sr=sr,
                             do_continuous_f0=False)
    r = convert_wav_to_pitch(refer_wave, hop_length=256, sr=sr,
                             do_continuous_f0=False)
    pa, pb = dtw_path(h, r)
    h, r = h[pa], r[pb]
    voiced = (h > 0) & (r > 0)
    if voiced.sum() == 0:
        return None
    rmse = float(np.sqrt(np.mean(
        (np.log(h[voiced]) - np.log(r[voiced])) ** 2)))
    return None if np.isnan(rmse) else rmse
