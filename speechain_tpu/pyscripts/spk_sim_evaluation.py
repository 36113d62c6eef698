"""Speaker-similarity evaluation CLI: cosine similarity between speaker
embeddings of synthesized and reference audio.

Rebuild of reference ``recipes/tts/spk_sim_evaluation.py`` (cosine score at
:43, result dumps at the tail): embeds both waveform sets with ECAPA-TDNN or
x-vector (``speechain_tpu.nn.speaker``), computes per-utterance cosine
similarity, and writes ``idx2{model}_spk_sim`` + an ``overall_results.md``
summary. Pre-extracted embeddings (idx2spk_feat pointing at .npy files) are
also accepted on either side, skipping the encoder for that side.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

from speechain_tpu.utils.fileio import read_data_by_path, read_idx2data_file
from speechain_tpu.utils.reports import md_table, topn_bad_cases, write_idx2_file


def _embed_all(idx2path: Dict[str, str], is_feat: bool, spk_model: str,
               checkpoint: str, sr: int) -> Dict[str, np.ndarray]:
    if is_feat:
        return {i: np.asarray(read_data_by_path(p), np.float32).reshape(-1)
                for i, p in idx2path.items()}
    import jax.numpy as jnp

    from speechain_tpu.nn.speaker import (EncoderClassifier,
                                          restore_speaker_variables)
    from speechain_tpu.ops.frontend import FrontendConfig, LogMelFrontend

    variables = restore_speaker_variables(checkpoint, spk_model)
    model = EncoderClassifier(model_type=spk_model)
    fe = LogMelFrontend(FrontendConfig(sr=sr, n_mels=80))
    out = {}
    for idx, path in idx2path.items():
        wave = np.asarray(read_data_by_path(path)).reshape(-1)
        feat, feat_len = fe(jnp.asarray(wave[None], jnp.float32),
                            jnp.asarray([len(wave)]))
        emb = model.apply(variables, feat, feat_len)
        out[idx] = np.asarray(emb[0], np.float32).reshape(-1)
    return out


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    denom = float(np.linalg.norm(a) * np.linalg.norm(b))
    return float(np.dot(a, b) / denom) if denom > 0 else 0.0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hypo_path", required=True,
                   help="idx2wav (or idx2spk_feat with --hypo_is_feat) of "
                        "synthesized audio")
    p.add_argument("--refer_path", required=True,
                   help="idx2wav (or idx2spk_feat with --refer_is_feat) of "
                        "reference audio")
    p.add_argument("--hypo_is_feat", action="store_true")
    p.add_argument("--refer_is_feat", action="store_true")
    p.add_argument("--spk_model", default="ecapa",
                   choices=["ecapa", "xvector"])
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir with the speaker-encoder variables; "
                        "required unless both sides are pre-extracted feats")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--result_path", default=None)
    p.add_argument("--topn_num", type=int, default=30)
    args = p.parse_args(argv)

    if not (args.hypo_is_feat and args.refer_is_feat) and not args.checkpoint:
        raise ValueError("--checkpoint is required to embed raw waveforms")

    idx2hypo = read_idx2data_file(args.hypo_path)
    idx2refer = read_idx2data_file(args.refer_path)
    h_emb = _embed_all(idx2hypo, args.hypo_is_feat, args.spk_model,
                       args.checkpoint, args.sr)
    r_emb = _embed_all(idx2refer, args.refer_is_feat, args.spk_model,
                       args.checkpoint, args.sr)

    idx2sim = {i: cosine_similarity(h_emb[i], r_emb[i])
               for i in h_emb if i in r_emb}
    result_path = args.result_path or os.path.dirname(
        os.path.abspath(args.hypo_path))
    os.makedirs(result_path, exist_ok=True)
    metric = f"{args.spk_model}_spk_sim"
    write_idx2_file({k: f"{v:.4f}" for k, v in idx2sim.items()},
                    os.path.join(result_path, f"idx2{metric}"))

    vals = np.array(list(idx2sim.values()), np.float64)
    lines = ["# Speaker similarity evaluation", "",
             md_table(["metric", "#utts", "mean", "std"],
                      [[metric, len(vals),
                        f"{vals.mean():.4f}" if len(vals) else "n/a",
                        f"{vals.std():.4f}" if len(vals) else "n/a"]]),
             "", f"## Top-{args.topn_num} least similar",
             md_table(["idx", metric],
                      [[i, f"{v:.4f}"] for i, v in
                       topn_bad_cases(idx2sim, args.topn_num, mode="min")]),
             ""]
    with open(os.path.join(result_path, "overall_results.md"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {result_path}/overall_results.md "
          f"(mean {metric}={vals.mean():.4f} over {len(vals)} utts)"
          if len(vals) else "no shared indices between hypo and refer")


if __name__ == "__main__":
    main()
