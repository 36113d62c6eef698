"""Fused spectrum -> log-Mel Pallas TPU kernel.

The XLA path (ops/frontend.py) expresses the STFT as one strided conv plus a
separate mel matmul with intermediates in HBM. This kernel fuses the
windowed-DFT matmul, power, mel projection and log into a single
pallas_call: the (T, 2*n_freq) complex spectrum lives only in VMEM.

Framing (gather with hop stride) stays in XLA — Mosaic cannot lower
hop-strided (non-128-aligned) dynamic vector loads, and the gather is
memory-bound and fuses into the kernel's input DMA anyway.

Grid: (batch * frame-tiles). Per program: (TILE_T, n_fft) frames x
(n_fft, 2F) basis on the MXU -> power (VPU) -> (TILE_T, F) x (F, M) mel
matmul -> clamp/log -> (TILE_T, M) out.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.ops.frontend import (
    FrontendConfig,
    _num_frames,
    dft_filterbank,
    hann_window,
    mel_filterbank,
)

TILE_T = 128  # frames per program


def _logmel_kernel(frames_ref, basis_ref, mel_ref, out_ref, *,
                   n_freq: int, clamp: float, log_base, mag_spec: bool,
                   logging: bool, precision):
    # fp32 contract: the default MXU precision decomposes fp32 into bf16
    # passes and breaks the <1e-4 log-Mel bound; HIGHEST (6-pass) is exact
    # and HIGH (3-pass) also meets the bound where validated
    # (tools/validate_frontend_precision.py) — FrontendConfig.matmul_precision
    spec = jax.lax.dot_general(
        frames_ref[...], basis_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)
    re, im = spec[:, :n_freq], spec[:, n_freq:]
    power = re * re + im * im
    if mag_spec:
        power = jnp.sqrt(power)
    mel = jax.lax.dot_general(
        power, mel_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)
    if logging:
        mel = jnp.log(jnp.maximum(mel, clamp))
        if log_base is not None:
            mel = mel / math.log(log_base)
    out_ref[...] = mel


@functools.partial(jax.jit, static_argnames=("cfg",))
def pallas_logmel(wave: jnp.ndarray, wave_len: jnp.ndarray,
                  cfg: FrontendConfig):
    """wave (B, L) fp32 or int16 PCM -> (feat (B, T, n_mels), feat_len).
    Matches ops/frontend.py numerics (fp32 MXU matmuls)."""
    from speechain_tpu.ops.frontend import to_float_wave
    wave = to_float_wave(wave)
    B, L = wave.shape
    n_fft, hop, n_freq = cfg.fft, cfg.hop, cfg.n_freqs

    if cfg.preemphasis is not None:
        prev = jnp.pad(wave, ((0, 0), (1, 0)))[:, :-1]
        wave = wave - cfg.preemphasis * prev
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        wave = jnp.where(pos < wave_len[:, None], wave, 0.0)

    pad = n_fft // 2
    if cfg.center:
        wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")

    T = (wave.shape[1] - n_fft) // hop + 1
    T_padded = -(-T // TILE_T) * TILE_T
    need = (T_padded - 1) * hop + n_fft
    if wave.shape[1] < need:
        wave = jnp.pad(wave, ((0, 0), (0, need - wave.shape[1])))

    # framing: (B, T_padded, n_fft) gather, fused into the kernel input DMA
    idx = (jnp.arange(T_padded)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    frames = wave[:, idx].reshape(B * T_padded, n_fft)

    basis = jnp.asarray(dft_filterbank(
        n_fft, hann_window(cfg.win), cfg.onesided, cfg.normalized).T)
    mel_fb = jnp.asarray(mel_filterbank(
        n_freq, cfg.n_mels, cfg.sr, cfg.fmin, cfg.fmax, cfg.mel_scale,
        cfg.mel_norm))

    from speechain_tpu.ops.frontend import _precision
    kernel = functools.partial(
        _logmel_kernel, n_freq=n_freq, clamp=cfg.clamp,
        log_base=cfg.log_base if cfg.logging else None,
        mag_spec=cfg.mag_spec, logging=cfg.logging,
        precision=_precision(cfg))

    feat = pl.pallas_call(
        kernel,
        grid=(B * T_padded // TILE_T,),
        in_specs=[
            pl.BlockSpec((TILE_T, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_T, cfg.n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * T_padded, cfg.n_mels),
                                       jnp.float32),
    )(frames, basis, mel_fb)

    feat = feat.reshape(B, T_padded, cfg.n_mels)[:, :T]
    feat_len = _num_frames(wave_len, n_fft, hop, cfg.center).astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    feat = jnp.where(pos < feat_len[:, None, None], feat, 0.0)
    return feat, feat_len
