"""Vocode saved acoustic features (idx2feat npz/npy) to waveforms.

Rebuild of reference ``recipes/tts/feat_to_wav.py`` (vocode_by_gl :124 /
HiFi-GAN :143): batch Griffin-Lim or HiFi-GAN over saved log-Mel features.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from speechain_tpu.ops.frontend import FrontendConfig
from speechain_tpu.ops.griffin_lim import logmel_to_wave
from speechain_tpu.utils.fileio import (
    read_data_by_path,
    read_idx2data_file,
    write_idx2data_file,
    write_wav,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--feat_path", required=True, help="idx2feat file")
    p.add_argument("--save_path", required=True)
    p.add_argument("--vocoder", default="gl", choices=["gl", "hifigan"])
    p.add_argument("--hifigan_ckpt", default=None)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--n_mels", type=int, default=80)
    p.add_argument("--gl_iters", type=int, default=32)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    cfg = FrontendConfig(sr=args.sr, n_mels=args.n_mels, win_length=0.05,
                         hop_length=0.0125, fmin=125.0, fmax=7600.0)
    voc = voc_vars = None
    if args.vocoder == "hifigan":
        from speechain_tpu.nn.vocoder_hifigan import load_hifigan_vocoder
        voc, voc_vars = load_hifigan_vocoder(args.hifigan_ckpt)

    idx2feat = read_idx2data_file(args.feat_path)
    os.makedirs(args.save_path, exist_ok=True)
    idx2wav = {}
    for idx, path in idx2feat.items():
        feat = np.asarray(read_data_by_path(path), np.float32)[None]
        if args.vocoder == "gl":
            wave, wave_len = logmel_to_wave(
                jnp.asarray(feat), jnp.asarray([feat.shape[1]]), cfg,
                n_iter=args.gl_iters)
            n = int(wave_len[0])
        else:
            wave = voc.apply(voc_vars, jnp.asarray(feat))
            n = wave.shape[1]
        out = os.path.join(args.save_path, f"{idx}.wav")
        write_wav(out, np.asarray(wave[0][:n]), args.sr)
        idx2wav[idx] = out
    write_idx2data_file(idx2wav, os.path.join(args.save_path, "idx2wav"))
    print(f"vocoded {len(idx2wav)} utterances ({args.vocoder})")


if __name__ == "__main__":
    main()
