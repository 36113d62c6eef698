"""``speechain-align``: native CTC forced alignment of a corpus.

Aligns (idx2wav, idx2text) pairs with a trained CTC-headed ASR model
(infer/ctc_align.py) and writes ``idx2duration`` (space-separated frames
per token, ENCODER frame rate) + ``idx2align_score``. This is the
in-framework replacement for the reference's external MFA round-trip
(reference TTS recipes shell out to the Montreal Forced Aligner and
parse TextGrids back; see pyscripts/duration_calculator.py) — durations
for FastSpeech2 come from a model the framework trained itself.

Multiply ``--scale`` (e.g. the encoder prenet's total conv stride) to
convert encoder frames to frontend-hop frames.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="speechain-align",
        description="CTC forced alignment with a trained ASR model.")
    p.add_argument("--config", required=True, help="exp_cfg yaml")
    p.add_argument("--result_path", required=True)
    p.add_argument("--test_model", default=None)
    p.add_argument("--wav_scp", required=True, help="idx2wav file")
    p.add_argument("--text", required=True, help="idx2text file")
    p.add_argument("--output", required=True,
                   help="output dir for idx2duration / idx2align_score")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--scale", type=int, default=1,
                   help="multiply durations (encoder frames -> e.g. "
                        "frontend hops via the prenet's total stride)")
    p.add_argument("--weight_quant", default=None, choices=[None, "int8"])
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from speechain_tpu import runner as R
    from speechain_tpu.builders import build_model, build_tokenizer
    from speechain_tpu.infer.ctc_align import make_ctc_aligner
    from speechain_tpu.train.checkpoint import CheckpointManager
    from speechain_tpu.utils.fileio import (read_data_by_path,
                                            read_idx2data_file,
                                            write_idx2data_file)

    cfg = R.merge_config(argparse.Namespace(
        config=args.config, result_path=args.result_path, test_model=None,
        **{k: None for k in R.DEFAULTS}))
    model_cfg = cfg["train_cfg"]["model"]
    customize = (model_cfg.get("model_conf", {}) or {}).get(
        "customize_conf", {})
    tokenizer = build_tokenizer(customize.get("token_type", "char"),
                                customize.get("token_path"))
    net, net_cfg, _ = build_model(model_cfg, tokenizer.vocab_size)
    if not getattr(net_cfg, "ctc_weight", 0.0):
        p.error("the model has no CTC head (ctc_weight == 0) — forced "
                "alignment needs one")

    ckpt = CheckpointManager(args.result_path)
    if args.test_model in (None, "latest"):
        state, _ = ckpt.restore_train_state(None)
        variables = {"params": state["params"], **state["mutables"]}
    else:
        import orbax.checkpoint as ocp
        payload = ocp.StandardCheckpointer().restore(
            os.path.join(args.result_path, "models", args.test_model), None)
        variables = dict(payload)
    if args.weight_quant:
        from speechain_tpu.infer.quantize import quantize_variables
        variables = quantize_variables(variables)

    idx2wav = read_idx2data_file(args.wav_scp)
    idx2text = read_idx2data_file(args.text)
    ids = [i for i in idx2wav if i in idx2text]
    align = make_ctc_aligner(net)

    # sort by duration so each padded batch wastes little; pad T up to a
    # multiple so few executables get compiled
    waves = {i: np.asarray(read_data_by_path(idx2wav[i]),
                           np.float32).reshape(-1) for i in ids}
    # bare tokens, no sos/eos wrapping — alignment is over the transcript
    toks = {i: np.asarray(tokenizer.text2tensor(idx2text[i], no_sos=True,
                                                no_eos=True), np.int32)
            for i in ids}
    order = sorted(ids, key=lambda i: len(waves[i]))
    quantum = net_cfg.frontend.hop * 64

    out_dur, out_score = {}, {}
    for k in range(0, len(order), args.batch):
        chunk = order[k:k + args.batch]
        B = len(chunk)
        Tmax = max(len(waves[i]) for i in chunk)
        Tmax = ((Tmax + quantum - 1) // quantum) * quantum
        Lmax = max(1, max(len(toks[i]) for i in chunk))
        feat = np.zeros((B, Tmax, 1), np.float32)
        feat_len = np.zeros((B,), np.int32)
        labels = np.zeros((B, Lmax), np.int32)
        label_len = np.zeros((B,), np.int32)
        for b, i in enumerate(chunk):
            w, t = waves[i], toks[i]
            feat[b, :len(w), 0] = w
            feat_len[b] = len(w)
            labels[b, :len(t)] = t
            label_len[b] = len(t)
        res, _ = align(variables, jnp.asarray(feat), jnp.asarray(feat_len),
                       jnp.asarray(labels), jnp.asarray(label_len))
        dur = np.asarray(res.durations) * args.scale
        score = np.asarray(res.score)
        for b, i in enumerate(chunk):
            out_dur[i] = " ".join(str(int(d))
                                  for d in dur[b, :int(label_len[b])])
            out_score[i] = f"{float(score[b]):.4f}"
        print(f"aligned {min(k + args.batch, len(order))}/{len(order)}",
              flush=True)

    os.makedirs(args.output, exist_ok=True)
    write_idx2data_file(out_dur, os.path.join(args.output, "idx2duration"))
    write_idx2data_file(out_score,
                        os.path.join(args.output, "idx2align_score"))
    print(f"wrote {len(out_dur)} alignments to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
