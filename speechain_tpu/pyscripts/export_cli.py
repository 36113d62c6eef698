"""``speechain-export``: AOT-export serving executables to StableHLO.

Compile-once deployment (infer/export.py): lowers the streaming tick
executables and/or the one-executable beam-search decoder of a trained
experiment into portable ``.shlo`` artifacts + a ``manifest.json``. With
``--platforms cpu tpu`` the artifacts are TPU-servable even when exported
from a CPU-only build machine (cross-platform lowering). Load at serving
time with ``speechain_tpu.infer.export.load_serving(path).call(...)``
plus the checkpoint's variables — no model code needed on the fleet.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="speechain-export",
        description="Export serving executables to StableHLO artifacts.")
    p.add_argument("--config", required=True, help="exp_cfg yaml")
    p.add_argument("--result_path", required=True,
                   help="experiment dir holding the checkpoint")
    p.add_argument("--test_model", default=None,
                   help="models/<name> snapshot (default: latest state)")
    p.add_argument("--out", required=True, help="artifact output dir")
    p.add_argument("--what", nargs="+", default=["stream"],
                   choices=["stream", "decode"],
                   help="stream = start/step/finish tick executables "
                        "(causal models); decode = offline beam search")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="target platforms, e.g. --platforms cpu tpu "
                        "(default: the local backend)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--chunk_ms", type=float, default=400.0)
    p.add_argument("--max_frames", type=int, default=4096)
    p.add_argument("--feat_seconds", type=float, default=8.0,
                   help="decode artifact's fixed utterance length")
    p.add_argument("--beam_size", type=int, default=16)
    p.add_argument("--max_len", type=int, default=128)
    p.add_argument("--weight_quant", default=None, choices=[None, "int8"],
                   help="export the int8-weight serving graph (the "
                        "artifact dequantizes in-executable)")
    args = p.parse_args(argv)

    from speechain_tpu import runner as R
    from speechain_tpu.builders import build_model, build_tokenizer
    from speechain_tpu.infer.export import (export_asr_decoder,
                                            export_stream_asr)
    from speechain_tpu.train.checkpoint import CheckpointManager

    cfg = R.merge_config(argparse.Namespace(
        config=args.config, result_path=args.result_path, test_model=None,
        **{k: None for k in R.DEFAULTS}))
    model_cfg = cfg["train_cfg"]["model"]
    customize = (model_cfg.get("model_conf", {}) or {}).get(
        "customize_conf", {})
    tokenizer = build_tokenizer(customize.get("token_type", "char"),
                                customize.get("token_path"))
    net, net_cfg, _ = build_model(model_cfg, tokenizer.vocab_size)

    ckpt = CheckpointManager(args.result_path)
    if args.test_model in (None, "latest"):
        state, _ = ckpt.restore_train_state(None)
        variables = {"params": state["params"], **state["mutables"]}
    else:
        import orbax.checkpoint as ocp
        payload = ocp.StandardCheckpointer().restore(
            os.path.join(args.result_path, "models", args.test_model), None)
        variables = dict(payload)

    sr, hop = net_cfg.frontend.sr, net_cfg.frontend.hop
    os.makedirs(args.out, exist_ok=True)

    if "stream" in args.what:
        from speechain_tpu.infer.streaming import StreamingASR
        chunk = max(int(args.chunk_ms / 1000.0 * sr) // hop, 1) * hop
        chunk = max(chunk, net_cfg.frontend.fft)
        stream = StreamingASR(net, variables, chunk_samples=chunk,
                              max_frames=args.max_frames,
                              weight_quant=args.weight_quant)
        paths = export_stream_asr(stream, args.out, batch_size=args.batch,
                                  platforms=args.platforms)
        for mode, path in paths.items():
            print(f"stream/{mode}: {path} "
                  f"({os.path.getsize(path) / 2**20:.2f} MB)")

    if "decode" in args.what:
        if args.weight_quant:
            from speechain_tpu.infer.quantize import quantize_variables
            variables = quantize_variables(variables)
        T = int(args.feat_seconds * sr)
        path = export_asr_decoder(
            net, variables, (args.batch, T), args.out,
            platforms=args.platforms, beam_size=args.beam_size,
            max_len=args.max_len, sos_eos=tokenizer.vocab_size - 1)
        print(f"decode: {path} ({os.path.getsize(path) / 2**20:.2f} MB)")

    print(f"manifest: {os.path.join(args.out, 'manifest.json')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
