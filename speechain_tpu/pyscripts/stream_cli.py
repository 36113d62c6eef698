"""``speechain-stream``: online (chunked) ASR transcription from the CLI.

The user-facing surface of `infer/streaming.py`: load a trained causal ASR
experiment (``encoder: {uni_direction: true}`` + ``ctc_weight > 0`` in its
exp_cfg), then transcribe wav files chunk by chunk exactly as a live
microphone/server stream would — partial hypotheses print as they
stabilize, and the emitted tokens are exactly what the offline model would
produce on the whole file (guaranteed by tests/test_streaming.py; verify
in the field with --selftest).

Usage::

    speechain-stream --config exp_cfg.yaml --result_path exp/... \
        --wav a.wav b.wav [--chunk_ms 400] [--selftest]
    speechain-stream ... --wav_scp idx2wav --output idx2text_streamed
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True,
                   help="the ASR experiment's exp_cfg yaml (causal model)")
    p.add_argument("--result_path", required=True,
                   help="experiment dir holding the checkpoint")
    p.add_argument("--test_model", default="latest")
    p.add_argument("--wav", nargs="*", default=None, help="wav file(s)")
    p.add_argument("--wav_scp", default=None, help="idx2wav file")
    p.add_argument("--output", default=None,
                   help="write an idx2text file instead of stdout only")
    p.add_argument("--chunk_ms", type=float, default=400.0,
                   help="stream chunk size in milliseconds")
    p.add_argument("--max_frames", type=int, default=4096,
                   help="encoder KV-cache capacity (max stream length)")
    p.add_argument("--selftest", action="store_true",
                   help="also run the model offline on each wav and assert "
                        "the streamed tokens match exactly")
    p.add_argument("--concurrency", type=int, default=1,
                   help="serve N wavs concurrently through the continuous-"
                        "batching StreamPool (one device dispatch per tick "
                        "for all N); 1 = sequential lockstep streaming")
    p.add_argument("--weight_quant", default=None, choices=["int8"],
                   help="serve int8-quantized weights (infer/quantize.py); "
                        "--selftest then checks against the offline "
                        "QUANTIZED model")
    p.add_argument("--wq_min_elems", type=int, default=8192,
                   help="quantize only weight leaves with at least this "
                        "many elements")
    p.add_argument("--timestamps", action="store_true",
                   help="report the emission time (seconds) of every "
                        "token; with --output also writes an idx2time "
                        "file of space-separated per-token seconds "
                        "(pool path, i.e. implies it)")
    p.add_argument("--beam", type=int, default=0,
                   help="first-pass CTC prefix beam width (0 = greedy); "
                        "the final transcript is the best beam")
    p.add_argument("--beam_prune", type=int, default=8,
                   help="per-frame vocab shortlist for beam extensions")
    p.add_argument("--rescore", action="store_true",
                   help="two-pass serving: rescore the CTC n-best with the "
                        "attention decoder at stream end (needs --beam)")
    p.add_argument("--rescore_weight", type=float, default=0.3,
                   help="final score = w*ctc + (1-w)*attention")
    p.add_argument("--max_text_len", type=int, default=128,
                   help="beam hypothesis length cap")
    p.add_argument("--lm_config", default=None,
                   help="external LM module yaml (or the LM experiment's "
                        "exp_cfg) for n-best rescoring")
    p.add_argument("--lm_ckpt", default=None,
                   help="orbax checkpoint path of the external LM")
    p.add_argument("--lm_weight", type=float, default=0.0,
                   help="add lm_weight * log P_lm(hyp) to the final score "
                        "(needs --beam, --lm_config, --lm_ckpt)")
    p.add_argument("--endpoint_blank_ms", type=float, default=None,
                   help="CTC endpointing: stop a stream once its trailing "
                        "run of blank encoder frames covers this many ms "
                        "(command-style recognition: remaining audio is "
                        "discarded); --selftest then checks against the "
                        "offline model on the consumed prefix")
    args = p.parse_args(argv)
    if not args.wav and not args.wav_scp:
        p.error("need --wav files or --wav_scp")

    import jax.numpy as jnp
    import numpy as np

    from speechain_tpu import runner as R
    from speechain_tpu.builders import build_model, build_tokenizer
    from speechain_tpu.infer.streaming import (StreamingASR,
                                               ctc_greedy_offline)
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

    ckpt = CheckpointManager(args.result_path)
    if args.test_model in (None, "latest"):
        state, _ = ckpt.restore_train_state(None)
        variables = {"params": state["params"], **state["mutables"]}
    else:
        import orbax.checkpoint as ocp
        payload = ocp.StandardCheckpointer().restore(
            os.path.join(args.result_path, "models", args.test_model), None)
        variables = dict(payload)

    sr = net_cfg.frontend.sr
    hop = net_cfg.frontend.hop
    chunk = max(int(args.chunk_ms / 1000.0 * sr) // hop, 1) * hop
    chunk = max(chunk, net_cfg.frontend.fft)
    if args.rescore and not args.beam:
        p.error("--rescore needs --beam N")
    lm_net = lm_vars = None
    if args.lm_weight != 0.0:
        if not (args.beam and args.lm_config and args.lm_ckpt):
            p.error("--lm_weight needs --beam, --lm_config and --lm_ckpt")
        import orbax.checkpoint as ocp

        from speechain_tpu.builders import build_lm
        from speechain_tpu.utils.yamlref import load_yaml
        lm_conf = load_yaml(args.lm_config)
        for key in ("train_cfg", "model", "module_conf"):
            if isinstance(lm_conf, dict) and key in lm_conf:
                lm_conf = lm_conf[key]
        lm_net, _ = build_lm(lm_conf, tokenizer.vocab_size)
        payload = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.lm_ckpt), None)
        lm_vars = {"params": payload.get("params", payload)}
    stream = StreamingASR(net, variables, chunk_samples=chunk,
                          max_frames=args.max_frames,
                          weight_quant=args.weight_quant,
                          wq_min_elems=args.wq_min_elems,
                          beam_size=args.beam, beam_prune=args.beam_prune,
                          max_text_len=args.max_text_len,
                          rescore=args.rescore,
                          rescore_weight=args.rescore_weight)
    # selftest/short-file reference: the float tree the stream is exact
    # against (the dequantized weights when --weight_quant is set)
    off_vars = stream.offline_variables

    if args.wav_scp:
        wavs = list(read_idx2data_file(args.wav_scp).items())
    else:
        wavs = [(os.path.basename(w), w) for w in args.wav]

    if args.concurrency > 1 or args.endpoint_blank_ms is not None \
            or args.timestamps:
        # endpointing/timestamps live in the pool's tick, so that path
        # serves them even at concurrency 1
        results, times = _run_pool(args, net, net_cfg, variables, tokenizer,
                                   wavs, sr, chunk, lm_net, lm_vars)
        if args.output:
            write_idx2data_file(results, args.output)
            print(f"wrote {len(results)} transcripts to {args.output}")
            if args.timestamps:
                write_idx2data_file(
                    {k: " ".join(f"{t:.3f}" for t in v)
                     for k, v in times.items()}, args.output + "_time")
                print(f"wrote per-token seconds to {args.output}_time")
        return

    results = {}
    for idx, path in wavs:
        wave, file_sr = read_data_by_path(path, return_sample_rate=True)
        wave = np.asarray(wave, np.float32).reshape(-1)
        if file_sr != sr:
            print(f"[{idx}] skip: file sr={file_sr} != model sr={sr}",
                  file=sys.stderr)
            continue
        if len(wave) < chunk:
            # shorter than one chunk: nothing to stream — run offline
            feat = jnp.asarray(wave, jnp.float32)[None, :, None]
            flen = jnp.full((1,), len(wave), jnp.int32)
            oid, oem = ctc_greedy_offline(net, off_vars, feat, flen)
            results[idx] = tokenizer.tensor2text(oid[0][oem[0]])
            print(f"[{idx}] (short file, offline): {results[idx]}",
                  flush=True)
            continue
        toks = []
        n_full = len(wave) // chunk
        wave_iter = [wave[c * chunk:(c + 1) * chunk]
                     for c in range(n_full)]
        rest = wave[n_full * chunk:]
        tail = np.zeros(chunk, np.float32)
        tail[:len(rest)] = rest
        tail_len = len(rest)

        state = stream.reset(1)
        for c, piece in enumerate(wave_iter):
            call = stream.start if c == 0 else stream.step
            state, ids, emit = call(state, jnp.asarray(piece)[None])
            new = np.asarray(ids)[0][np.asarray(emit)[0]].tolist()
            if new:
                toks.extend(new)
                print(f"[{idx}] +{(c + 1) * chunk / sr:6.2f}s  "
                      f"{tokenizer.tensor2text(np.asarray(toks))}",
                      flush=True)
        state, ids, emit = stream.finish(state, jnp.asarray(tail)[None],
                                         tail_len)
        toks.extend(np.asarray(ids)[0][np.asarray(emit)[0]].tolist())
        text = tokenizer.tensor2text(np.asarray(toks))
        if args.beam:
            # greedy partials above were the low-latency first pass; the
            # final transcript is the (optionally attention-rescored) best
            # prefix-beam hypothesis
            nb = stream.final_nbest(state, lm_net=lm_net,
                                    lm_variables=lm_vars,
                                    lm_weight=args.lm_weight)
            best = nb["tokens"][0, 0, :nb["lengths"][0, 0]]
            text = tokenizer.tensor2text(np.asarray(best))
            tag = "rescored" if args.rescore else f"beam {args.beam}"
            if args.lm_weight:
                tag += f" +lm*{args.lm_weight:g}"
            print(f"[{idx}] final ({tag}): {text}", flush=True)
        else:
            print(f"[{idx}] final: {text}", flush=True)
        results[idx] = text

        if args.selftest:
            feat = jnp.asarray(wave, jnp.float32)[None, :, None]
            flen = jnp.full((1,), len(wave), jnp.int32)
            oid, oem = ctc_greedy_offline(net, off_vars, feat, flen)
            offline = oid[0][oem[0]].tolist()
            if offline != toks:
                raise SystemExit(
                    f"[{idx}] SELFTEST FAILED: stream {toks} != "
                    f"offline {offline}")
            print(f"[{idx}] selftest OK (stream == offline)", flush=True)

    if args.output:
        write_idx2data_file(results, args.output)
        print(f"wrote {len(results)} transcripts to {args.output}")


def _run_pool(args, net, net_cfg, variables, tokenizer, wavs, sr, chunk,
              lm_net=None, lm_vars=None):
    """Continuous-batching path: N wavs in flight per device tick."""
    import jax.numpy as jnp
    import numpy as np

    from speechain_tpu.infer.stream_pool import StreamPool, StreamServer
    from speechain_tpu.infer.streaming import ctc_greedy_offline
    from speechain_tpu.utils.fileio import read_data_by_path

    pool = StreamPool(net, variables, slots=args.concurrency,
                      chunk_samples=chunk, max_frames=args.max_frames,
                      weight_quant=args.weight_quant,
                      wq_min_elems=args.wq_min_elems,
                      beam_size=args.beam, beam_prune=args.beam_prune,
                      max_text_len=args.max_text_len, rescore=args.rescore,
                      rescore_weight=args.rescore_weight)
    off_vars = pool.offline_variables
    endpointing = args.endpoint_blank_ms is not None
    server = StreamServer(pool, endpoint_blank_ms=args.endpoint_blank_ms,
                          lm_net=lm_net, lm_variables=lm_vars,
                          lm_weight=args.lm_weight)
    min_samples = net_cfg.frontend.fft // 2 + 1

    pending = list(wavs)
    loaded, results, dropped, times = {}, {}, {}, {}
    while pending or server.active:
        # attach files while slots are free
        while pending and server.active < args.concurrency:
            idx, path = pending.pop(0)
            wave, file_sr = read_data_by_path(path, return_sample_rate=True)
            wave = np.asarray(wave, np.float32).reshape(-1)
            if file_sr != sr:
                print(f"[{idx}] skip: file sr={file_sr} != model sr={sr}",
                      file=sys.stderr)
                continue
            if len(wave) < min_samples:
                print(f"[{idx}] skip: {len(wave)} samples is shorter than "
                      f"the reflect-pad bound ({min_samples})",
                      file=sys.stderr)
                continue
            server.open(idx)
            server.feed(idx, wave)   # files are fully available: feed whole
            if not endpointing:
                server.end(idx)      # stream until the file runs out
            loaded[idx] = wave
        server.step()
        if endpointing:
            # endpoint-or-drain: stop a live stream at the first long
            # silence (discarding the rest), else end it naturally once
            # its audio is consumed so the tail flushes next tick
            for idx in loaded:
                if server.result(idx) is not None or idx in dropped:
                    continue
                if server.endpointed(idx):
                    dropped[idx] = server.cutoff(idx)
                    at = (len(loaded[idx]) - dropped[idx]) / sr
                    print(f"[{idx}] endpointed at {at:.2f}s "
                          f"({dropped[idx] / sr:.2f}s discarded)",
                          flush=True)
                elif server.buffered(idx) < chunk:
                    dropped[idx] = 0
                    server.end(idx)
        for idx in list(loaded):
            toks = server.result(idx)
            if toks is None:
                continue
            if args.beam:
                nb = server.nbest(idx)
                best = nb["tokens"][0, 0, :nb["lengths"][0, 0]]
                results[idx] = tokenizer.tensor2text(np.asarray(best))
                tag = "rescored" if args.rescore else f"beam {args.beam}"
                if args.lm_weight:
                    tag += f" +lm*{args.lm_weight:g}"
                print(f"[{idx}] final ({tag}): {results[idx]}", flush=True)
            else:
                results[idx] = tokenizer.tensor2text(np.asarray(toks))
                print(f"[{idx}] final: {results[idx]}", flush=True)
            if args.timestamps:
                times[idx] = [f * server.frame_seconds
                              for f in server.result_frames(idx)]
                stamped = " ".join(
                    f"{tokenizer.tensor2text(np.asarray([t]))}@{s:.2f}s"
                    for t, s in zip(toks, times[idx]))
                print(f"[{idx}] times: {stamped}", flush=True)
            if args.selftest:
                # with endpointing, the stream by design saw only the
                # prefix up to the cut — selftest against that prefix
                wave = loaded[idx][:len(loaded[idx]) - dropped.get(idx, 0)]
                feat = jnp.asarray(wave, jnp.float32)[None, :, None]
                flen = jnp.full((1,), len(wave), jnp.int32)
                oid, oem = ctc_greedy_offline(net, off_vars, feat, flen)
                offline = oid[0][oem[0]].tolist()
                if offline != toks:
                    raise SystemExit(
                        f"[{idx}] SELFTEST FAILED: stream {toks} != "
                        f"offline {offline}")
                print(f"[{idx}] selftest OK (stream == offline)", flush=True)
            del loaded[idx]
    return results, times


if __name__ == "__main__":
    main()
