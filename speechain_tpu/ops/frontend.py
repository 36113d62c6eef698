"""On-the-fly acoustic frontend: waveform -> (log-)Mel spectrogram.

TPU-native re-design of the reference frontend stack
(``module/frontend/speech2linear.py`` + ``linear2mel.py`` + ``speech2mel.py``):
instead of torch.stft + a frozen Linear mel layer, the whole
pre-emphasis -> framing -> windowed DFT -> power -> mel -> log pipeline is one
pure fp32 function. The STFT is expressed as a strided convolution against a
fixed windowed cos/sin filter bank, which XLA lowers onto the MXU (no FFT
butterflies, no power-of-2 restriction -- n_fft=400 runs at full tile
efficiency). A fused Pallas kernel variant lives in ``ops/pallas``.

Numerical contract (validated by golden tests against torch.stft +
torchaudio.melscale_fbanks): max abs err of log-Mel < 1e-4.

Reference behavior reproduced:
- hop/win given in seconds are converted via int(x * sr)  (speech2linear.py:85-90)
- n_fft defaults to win_length                             (speech2linear.py:93-94)
- hann periodic window, center=True reflect padding        (torch.stft defaults)
- feat_len = (wave_len + 2*(n_fft//2) - n_fft)//hop + 1    (speech2linear.py:202-212)
- power spectrum real^2+imag^2; optional sqrt magnitude    (speech2linear.py:214,236)
- optional per-frame L2 energy for FastSpeech2             (speech2linear.py:216-222)
- silence frames zeroed beyond feat_len                    (speech2linear.py:226-233)
- mel fbank: torchaudio melscale_fbanks, slaney scale+norm (linear2mel.py:135-155)
- clamp(1e-10) -> log -> /log(10)                          (linear2mel.py:179-189)
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# host-side constant construction (numpy, float64 -> float32)
# --------------------------------------------------------------------------

def hz_to_mel(freq, mel_scale: str = "slaney"):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_sp = 200.0 / 3.0
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
                    mels)


def mel_to_hz(mels, mel_scale: str = "slaney"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3.0
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: Optional[float] = None,
                   mel_scale: str = "slaney", norm: bool = True) -> np.ndarray:
    """Triangular mel filter bank, shape (n_freqs, n_mels).

    Matches torchaudio.functional.melscale_fbanks (linear2mel.py:135-143).
    """
    f_max = float(f_max) if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min, m_max = hz_to_mel(f_min, mel_scale), hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(float(m_min), float(m_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)
    # triangles
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm:  # slaney area normalization
        enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def dft_filterbank(n_fft: int, window: np.ndarray, onesided: bool = True,
                   normalized: bool = False) -> np.ndarray:
    """Windowed DFT basis as a conv filter bank: (2*n_freq, n_fft).

    Row k (< n_freq) is w[n]*cos(2 pi k n / n_fft); row n_freq+k the -sin
    counterpart, so conv output channels are (real, imag) interleaved halves.
    """
    n_freq = n_fft // 2 + 1 if onesided else n_fft
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * k * n[None, :] / n_fft
    win = np.zeros(n_fft, dtype=np.float64)
    # center a shorter window inside n_fft (torch.stft semantics)
    off = (n_fft - len(window)) // 2
    win[off: off + len(window)] = window.astype(np.float64)
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0) * win[None, :]
    if normalized:
        basis = basis / math.sqrt(np.sum(win ** 2))
    return basis.astype(np.float32)


# --------------------------------------------------------------------------
# config
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Config for the waveform->log-Mel pipeline (speech2mel.py:24-47 surface)."""
    n_mels: int = 80
    hop_length: float = 0.01       # int samples or float seconds
    win_length: float = 0.025
    n_fft: Optional[int] = None
    sr: int = 16000
    preemphasis: Optional[float] = None
    pre_stft_norm: Optional[str] = None
    center: bool = True
    normalized: bool = False
    onesided: bool = True
    mag_spec: bool = False
    return_energy: bool = False
    fmin: float = 0.0
    fmax: Optional[float] = None
    clamp: float = 1e-10
    logging: bool = True
    log_base: Optional[float] = 10.0
    mel_scale: str = "slaney"
    mel_norm: bool = True
    # MXU precision of the DFT/mel matmuls. "highest" = full f32-exact
    # accumulation (BASELINE contract: log-Mel err < 1e-4 vs f64);
    # "high" = 3-pass bf16 (~f32 effective, ~2x faster on TPU). Only
    # change after validating against the f64 golden on real hardware
    # (tests/test_frontend.py golden tolerances).
    matmul_precision: str = "highest"

    def __post_init__(self):
        # fmax above Nyquist leaves the top mel filters empty and the
        # usable ones coarse — a silent quality killer when a config
        # written for one sample rate (e.g. LJSpeech fmax=7600@22k) is
        # reused at a lower sr. The reference inherits torchaudio's
        # silence here; we warn.
        if self.fmax is not None and self.fmax > self.sr / 2:
            import warnings
            warnings.warn(
                f"frontend fmax={self.fmax} exceeds Nyquist ({self.sr / 2}):"
                f" mel filters above Nyquist are empty; set fmax <= sr/2",
                stacklevel=2)

    @property
    def hop(self) -> int:
        return int(self.hop_length * self.sr) if isinstance(self.hop_length, float) else int(self.hop_length)

    @property
    def win(self) -> int:
        return int(self.win_length * self.sr) if isinstance(self.win_length, float) else int(self.win_length)

    @property
    def fft(self) -> int:
        return int(self.n_fft) if self.n_fft is not None else self.win

    @property
    def n_freqs(self) -> int:
        return self.fft // 2 + 1 if self.onesided else self.fft

    @property
    def output_size(self) -> int:
        return self.n_mels


# --------------------------------------------------------------------------
# jit-friendly pipeline
# --------------------------------------------------------------------------

def _precision(cfg) -> jax.lax.Precision:
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[
        getattr(cfg, "matmul_precision", "highest")]


def _num_frames(wave_len, n_fft: int, hop: int, center: bool):
    eff = wave_len + (2 * (n_fft // 2) if center else 0)
    return (eff - n_fft) // hop + 1


def to_float_wave(wave: jnp.ndarray) -> jnp.ndarray:
    """Accept int16 PCM batches directly: the host loader keeps waveforms as
    int16 (half the host->device bytes, no host conversion pass) and the
    scale by 2^-15 happens here on device. 2^-15 is a power of two, so
    int16 -> float32 -> *2^-15 is EXACT and bit-identical to converting on
    the host (reference loads float via torchaudio,
    data_loading_util.py:21-45)."""
    if jnp.issubdtype(wave.dtype, jnp.integer):
        assert wave.dtype == jnp.int16, (
            f"integer waveforms must be int16 PCM, got {wave.dtype}")
        scaled = wave.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        # stop XLA re-associating the scale into downstream ops (e.g. fusing
        # it through pre-emphasis), which would break bit-exactness with the
        # host-converted float path
        return jax.lax.optimization_barrier(scaled)
    return wave.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def _frontend_impl(wave: jnp.ndarray, wave_len: jnp.ndarray,
                   dft_basis: jnp.ndarray, mel_fb: jnp.ndarray,
                   cfg: FrontendConfig):
    """wave (B, L) float or int16 PCM -> (feat (B, T, n_mels), feat_len,
    energy, energy_len)."""
    wave = to_float_wave(wave)
    B, L = wave.shape
    n_fft, hop = cfg.fft, cfg.hop
    n_freq = cfg.n_freqs

    # 1. pre-emphasis (speech2linear.py:168-177): y[t] = x[t] - p*x[t-1], y[0]=x[0]
    if cfg.preemphasis is not None:
        prev = jnp.pad(wave, ((0, 0), (1, 0)))[:, :-1]
        wave = wave - cfg.preemphasis * prev
        # zero out positions beyond each utterance's length
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        wave = jnp.where(pos < wave_len[:, None], wave, 0.0)

    # 2. optional pre-STFT normalization (speech2linear.py:181-190)
    if cfg.pre_stft_norm == "mean_std":
        mean = jnp.mean(wave, axis=1, keepdims=True)
        std = jnp.std(wave, axis=1, keepdims=True)
        wave = (wave - mean) / std
    elif cfg.pre_stft_norm == "min_max":
        lo = jnp.min(wave, axis=1, keepdims=True)
        hi = jnp.max(wave, axis=1, keepdims=True)
        wave = (wave - lo) / (hi - lo) * 2.0 - 1.0

    # 3. STFT as strided conv against windowed DFT basis (MXU path)
    if cfg.center:
        pad = n_fft // 2
        wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    spec = jax.lax.conv_general_dilated(
        wave[:, None, :], dft_basis[:, None, :],
        window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        # fp32-exact contract (BASELINE: log-Mel err < 1e-4): TPU MXU default
        # is bf16 passes for f32 inputs; force full-precision accumulation.
        precision=_precision(cfg),
    )  # (B, 2*n_freq, T)
    re, im = spec[:, :n_freq, :], spec[:, n_freq:, :]
    power = (re * re + im * im).transpose(0, 2, 1)        # (B, T, n_freq)
    T = power.shape[1]

    feat_len = _num_frames(wave_len, n_fft, hop, cfg.center).astype(jnp.int32)
    frame_pos = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    valid = frame_pos < feat_len[:, None, None]

    # 4. frame energy (L2 norm of magnitude frame) before masking, then mask
    energy = None
    if cfg.return_energy:
        energy = jnp.sqrt(jnp.clip(jnp.sum(power, axis=-1), min=1e-10))
        energy = jnp.where(valid[:, :, 0], energy, 0.0)

    power = jnp.where(valid, power, 0.0)
    if cfg.mag_spec:
        power = jnp.sqrt(power)

    # 5. mel projection (constant matmul) + clamp + log
    feat = jnp.einsum("btf,fm->btm", power, mel_fb,
                      preferred_element_type=jnp.float32,
                      precision=_precision(cfg))
    if cfg.logging:
        feat = jnp.log(jnp.clip(feat, min=cfg.clamp))
        if cfg.log_base is not None:
            feat = feat / math.log(cfg.log_base)
    # keep padded region exactly zero (log would give log(clamp) there)
    feat = jnp.where(valid, feat, 0.0)
    return feat, feat_len, energy, feat_len if cfg.return_energy else None


def compute_logmel(wave: jnp.ndarray, wave_len: jnp.ndarray,
                   cfg: FrontendConfig, *, use_pallas: Optional[bool] = None):
    """Dispatch between the XLA pipeline and the fused Pallas kernel.

    The Pallas kernel (ops/pallas_logmel.py) is ~1.6x faster on TPU and
    fp32-equivalent (measured max err 1.9e-5); it does not produce the
    energy output, so FastSpeech2-style calls stay on the XLA path.
    Default: Pallas on TPU backends, XLA elsewhere.
    """
    if use_pallas is None:
        import os
        backend = jax.default_backend()
        use_pallas = (backend not in ("cpu",) and not cfg.return_energy
                      and not os.environ.get("SPEECHAIN_DISABLE_PALLAS"))
    # convert int16 PCM BEFORE the jitted pipeline: called eagerly this puts
    # the conversion in its own executable, so the downstream program is the
    # same one the float path compiles -> bit-identical output. (Called from
    # inside an outer jit the conversion fuses and may differ by <1e-3 on
    # log-clamped silence frames — CPU FMA contraction across the fusion.)
    wave = to_float_wave(wave)
    if use_pallas:
        from speechain_tpu.ops.pallas_logmel import pallas_logmel
        feat, feat_len = pallas_logmel(wave, wave_len, cfg)
        return feat, feat_len, None, None
    basis = jnp.asarray(dft_filterbank(
        cfg.fft, hann_window(cfg.win), cfg.onesided, cfg.normalized))
    mel_fb = jnp.asarray(mel_filterbank(
        cfg.n_freqs, cfg.n_mels, cfg.sr, cfg.fmin, cfg.fmax, cfg.mel_scale,
        cfg.mel_norm))
    return _frontend_impl(wave, wave_len, basis, mel_fb, cfg)


class LogMelFrontend:
    """Callable frontend holding the precomputed constant banks.

    Usage::

        fe = LogMelFrontend(FrontendConfig(n_mels=80, preemphasis=0.97))
        feat, feat_len = fe(wave, wave_len)
    """

    def __init__(self, cfg: FrontendConfig = None, **kwargs):
        if cfg is None:
            cfg = FrontendConfig(**kwargs)
        self.cfg = cfg
        window = hann_window(cfg.win)
        self.dft_basis = jnp.asarray(
            dft_filterbank(cfg.fft, window, cfg.onesided, cfg.normalized))
        self.mel_fb = jnp.asarray(
            mel_filterbank(cfg.n_freqs, cfg.n_mels, cfg.sr, cfg.fmin, cfg.fmax,
                           cfg.mel_scale, cfg.mel_norm))

    @property
    def output_size(self) -> int:
        return self.cfg.output_size

    def __call__(self, wave: jnp.ndarray, wave_len: jnp.ndarray):
        feat, feat_len, energy, energy_len = _frontend_impl(
            wave, wave_len, self.dft_basis, self.mel_fb, self.cfg)
        if self.cfg.return_energy:
            return feat, feat_len, energy, energy_len
        return feat, feat_len

    def linear_spectrogram(self, wave: jnp.ndarray, wave_len: jnp.ndarray):
        """Power/magnitude linear spectrogram only (Speech2LinearSpec parity)."""
        lin_cfg = dataclasses.replace(self.cfg, logging=False)
        ident = jnp.eye(self.cfg.n_freqs, dtype=jnp.float32)
        feat, feat_len, _, _ = _frontend_impl(
            wave, wave_len, self.dft_basis, ident, lin_cfg)
        return feat, feat_len

    def num_frames(self, wave_len):
        return _num_frames(wave_len, self.cfg.fft, self.cfg.hop, self.cfg.center)
