"""Batch waveform downsampling: idx2wav -> resampled wavs + new idx2wav.

Rebuild of reference ``datasets/pyscripts/wave_downsampler.py`` using a
polyphase-free windowed-sinc resampler (scipy.signal.resample_poly when
available, linear interpolation fallback).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from speechain_tpu.utils.fileio import (
    read_data_by_path,
    read_idx2data_file,
    write_idx2data_file,
    write_wav,
)


def resample(wave: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return wave
    try:
        from scipy.signal import resample_poly
        from math import gcd
        g = gcd(sr_in, sr_out)
        return resample_poly(wave, sr_out // g, sr_in // g).astype(
            np.float32)
    except ImportError:
        n_out = int(round(len(wave) * sr_out / sr_in))
        src = np.linspace(0.0, len(wave) - 1.0, n_out)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, len(wave) - 1)
        w = src - lo
        return ((1 - w) * wave[lo] + w * wave[hi]).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--sample_rate", type=int, required=True)
    args = p.parse_args(argv)

    idx2wav = read_idx2data_file(args.wav_path)
    os.makedirs(args.save_path, exist_ok=True)
    new_idx2wav, new_len = {}, {}
    for idx, path in idx2wav.items():
        wave, sr = read_data_by_path(path, return_sample_rate=True)
        wave = resample(wave.reshape(-1), sr, args.sample_rate)
        out = os.path.join(args.save_path, f"{idx}.wav")
        write_wav(out, wave, args.sample_rate)
        new_idx2wav[idx] = out
        new_len[idx] = len(wave)
    write_idx2data_file(new_idx2wav, os.path.join(args.save_path, "idx2wav"))
    write_idx2data_file(new_len,
                        os.path.join(args.save_path, "idx2wav_len"))
    print(f"resampled {len(new_idx2wav)} files to {args.sample_rate} Hz")


if __name__ == "__main__":
    main()
