"""Offline pitch (F0) extraction: idx2wav -> .npy pitch tracks + idx2pitch.

Replaces the reference's pyworld dio+stonemask path
(``utilbox/feat_util.py:256`` / dataset/speech_text.py:95-104) with the
autocorrelation F0 estimator from utils/tts_eval (pyworld is not available
in this image). Frame rate matches the TTS frontend (12.5 ms hop).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from speechain_tpu.utils.fileio import (
    read_data_by_path,
    read_idx2data_file,
    write_idx2data_file,
)
from speechain_tpu.utils.tts_eval import wav_to_pitch


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--hop_length", type=float, default=0.0125)
    args = p.parse_args(argv)

    idx2wav = read_idx2data_file(args.wav_path)
    os.makedirs(args.save_path, exist_ok=True)
    idx2pitch = {}
    for idx, path in idx2wav.items():
        wave = read_data_by_path(path).reshape(-1)
        f0 = wav_to_pitch(wave, args.sr, hop_length=args.hop_length)
        out = os.path.join(args.save_path, f"{idx}.npy")
        np.save(out, f0.astype(np.float32))
        idx2pitch[idx] = out
    write_idx2data_file(idx2pitch, os.path.join(args.save_path, "idx2pitch"))
    print(f"extracted {len(idx2pitch)} pitch tracks to {args.save_path}")


if __name__ == "__main__":
    main()
