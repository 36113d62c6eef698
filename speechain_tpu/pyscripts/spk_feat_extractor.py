"""Offline speaker-embedding extraction: idx2wav -> .npy embeddings.

Rebuild of reference ``datasets/pyscripts/spk_feat_extractor.py`` +
``utilbox/spk_util.py:18``: ECAPA-TDNN or x-vector embeddings (192-d) from
log-mel features. Requires a local checkpoint (orbax dir with flax params);
random-init extraction is refused to avoid silently garbage embeddings.
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--spk_model", default="ecapa",
                   choices=["ecapa", "xvector"])
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir with the encoder variables, "
                        "or a torch .pt/.pth state dict (the reference's "
                        "encoder.pth) converted on the fly")
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from speechain_tpu.nn.speaker import (EncoderClassifier,
                                          restore_speaker_variables)

    variables = restore_speaker_variables(args.checkpoint, args.spk_model)
    model = EncoderClassifier(model_type=args.spk_model)
    fe = LogMelFrontend(FrontendConfig(sr=args.sr, n_mels=80))

    idx2wav = read_idx2data_file(args.wav_path)
    os.makedirs(args.save_path, exist_ok=True)
    idx2spk_feat = {}
    for idx, path in idx2wav.items():
        wave = read_data_by_path(path).reshape(-1)
        feat, feat_len = fe(jnp.asarray(wave[None]),
                            jnp.asarray([len(wave)]))
        emb = model.apply(variables, feat, feat_len)
        out = os.path.join(args.save_path, f"{idx}.npy")
        np.save(out, np.asarray(emb[0], np.float32))
        idx2spk_feat[idx] = out
    write_idx2data_file(idx2spk_feat,
                        os.path.join(args.save_path, "idx2spk_feat"))
    print(f"extracted {len(idx2spk_feat)} speaker embeddings")


if __name__ == "__main__":
    main()
