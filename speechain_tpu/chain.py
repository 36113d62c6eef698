"""Offline TTS->ASR speech-chain drivers.

Rebuild of reference ``recipes/offline_tts2asr/tts_synthesize.sh:1-378`` +
``recipes/tts/asr_evaluation.sh``: batch-synthesize pseudo speech from
unlabeled text with a trained TTS model (random reference speakers with
frequency balancing / mixup supported via RandomSpkFeatDataset), write the
pseudo ``idx2wav`` tree, then train MultiDataLoaderARASR on
{real, synthetic} streams (see train.state.make_multi_domain_arasr_step)
and evaluate the synthetic speech with a trained ASR.

CLI::

    python -m speechain_tpu.chain synthesize \
        --config tts_exp_cfg.yaml --result_path tts_exp \
        --text idx2text --save_path tts_syn_speech [--vocoder gl]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np


def synthesize_main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True,
                   help="the TTS experiment's exp_cfg yaml")
    p.add_argument("--result_path", required=True,
                   help="the TTS experiment dir (checkpoint source)")
    p.add_argument("--text", required=True, help="idx2text of unlabeled text")
    p.add_argument("--save_path", required=True)
    p.add_argument("--test_model", default="latest")
    p.add_argument("--vocoder", default="gl", choices=["gl", "hifigan"])
    p.add_argument("--hifigan_ckpt", default=None)
    p.add_argument("--spk_feat", default=None,
                   help="idx2spk_feat pool for random reference speakers")
    p.add_argument("--mixup_number", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=1000)
    p.add_argument("--gl_iters", type=int, default=32)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from speechain_tpu import runner as R
    from speechain_tpu.builders import build_model, build_tokenizer
    from speechain_tpu.data.dataset import RandomSpkFeatDataset
    from speechain_tpu.infer.tts_decoding import tts_auto_regression
    from speechain_tpu.ops.griffin_lim import logmel_to_wave
    from speechain_tpu.train.checkpoint import CheckpointManager
    from speechain_tpu.utils.fileio import (read_idx2data_file, write_wav,
                                            write_idx2data_file)

    cfg = R.merge_config(argparse.Namespace(
        config=args.config, result_path=args.result_path, test_model=None,
        **{k: None for k in R.DEFAULTS}))
    model_cfg = cfg["train_cfg"]["model"]
    customize = (model_cfg.get("model_conf", {}) or {}).get(
        "customize_conf", {})
    tokenizer = build_tokenizer(customize.get("token_type", "char"),
                                customize.get("token_path"))
    net, net_cfg, mtype = build_model(model_cfg, tokenizer.vocab_size)

    ckpt = CheckpointManager(args.result_path)
    state, _ = ckpt.restore_train_state(None)
    variables = {"params": state["params"], **state["mutables"]}

    idx2text = read_idx2data_file(args.text)

    spk_pool = None
    if args.spk_feat:
        spk_pool = RandomSpkFeatDataset(
            main_data={"text": dict(idx2text)}, spk_feat=args.spk_feat,
            mixup_number=args.mixup_number)

    os.makedirs(args.save_path, exist_ok=True)
    items = list(idx2text.items())
    idx2wav, idx2wav_len, idx2ref = {}, {}, {}
    rng = jax.random.PRNGKey(0)
    synth = None
    for start in range(0, len(items), args.batch_size):
        chunk = items[start:start + args.batch_size]
        ids = [tokenizer.text2tensor(t) for _, t in chunk]
        from speechain_tpu.data.iterator import bucket_len
        # bucket the token axis so the jitted synthesizer compiles once
        # per length bucket instead of once per batch
        L = bucket_len(max(len(t) for t in ids), 16, 16)
        text = np.full((len(chunk), L), tokenizer.ignore_idx, np.int32)
        text_len = np.zeros((len(chunk),), np.int32)
        for i, t in enumerate(ids):
            text[i, :len(t)] = t
            text_len[i] = len(t)
        spk_feat = None
        if spk_pool is not None:
            feats, refs = [], []
            for idx, _ in chunk:
                s = spk_pool[idx]
                feats.append(s["spk_feat"])
                refs.append(s["spk_feat_ids"])
            spk_feat = jnp.asarray(np.stack(feats))
            for (idx, _), ref in zip(chunk, refs):
                idx2ref[idx] = ref

        if synth is None:
            if "fastspeech" in mtype.lower() or "nar_tts" in mtype.lower():
                # non-autoregressive path (the reference's chain supports
                # FastSpeech2 synthesis too, tts_synthesize.sh:18): one
                # jitted forward with predicted durations, no while_loop
                import jax as _jax

                @_jax.jit
                def synth(variables, text, text_len, spk_feat=None):
                    out = net.apply(variables, text, text_len,
                                    spk_feat=spk_feat, train=False,
                                    max_frames=args.max_frames,
                                    rngs={"dropout": rng})
                    return {"hypo_feat": out["pred_after"],
                            "hypo_feat_len": out["pred_feat_len"]}
            else:
                from speechain_tpu.infer.tts_decoding import (
                    make_tts_synthesizer)
                synth = make_tts_synthesizer(net, max_frames=args.max_frames,
                                             rng=rng)
        out = synth(variables, jnp.asarray(text), jnp.asarray(text_len),
                    spk_feat=spk_feat)
        feat = net.apply(variables, out["hypo_feat"], None,
                         method=net.recover_feat)
        if args.vocoder == "gl":
            wave, wave_len = logmel_to_wave(
                feat, out["hypo_feat_len"], net_cfg.frontend,
                n_iter=args.gl_iters)
        else:
            from speechain_tpu.nn.vocoder_hifigan import load_hifigan_vocoder
            voc, voc_vars = load_hifigan_vocoder(args.hifigan_ckpt)
            wave = voc.apply(voc_vars, feat)
            hop = int(np.prod(voc.upsample_factors))
            wave_len = out["hypo_feat_len"] * hop
        for i, (idx, _) in enumerate(chunk):
            n = int(wave_len[i])
            path = os.path.join(args.save_path, f"{idx}.wav")
            write_wav(path, np.asarray(wave[i][:n]), net_cfg.frontend.sr)
            idx2wav[idx] = path
            idx2wav_len[idx] = n
    write_idx2data_file(idx2wav, os.path.join(args.save_path, "idx2wav"))
    write_idx2data_file(idx2wav_len,
                        os.path.join(args.save_path, "idx2wav_len"))
    if idx2ref:
        write_idx2data_file(idx2ref,
                            os.path.join(args.save_path, "idx2ref_spk"))
    print(f"synthesized {len(idx2wav)} utterances into {args.save_path}")


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "synthesize":
        return synthesize_main(argv[1:])
    raise SystemExit("usage: python -m speechain_tpu.chain synthesize ...")


if __name__ == "__main__":
    main()
