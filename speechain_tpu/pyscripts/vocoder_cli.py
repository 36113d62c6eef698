"""``speechain-vocoder``: load a local HiFi-GAN torch checkpoint and vocode.

Closes the env-blocked real-checkpoint validation path (the reference
downloads ``speechbrain/tts-hifigan-ljspeech`` at runtime —
``/root/reference/speechain/module/vocoder/hifigan.py:234-303``; this image
has no egress, so validation activates the first time a checkpoint file is
available locally).

Modes:
  --selftest    load the checkpoint, vocode a synthetic mel, and cross-check
                the flax remap against a minimal torch execution of the SAME
                checkpoint (exact generator math, no reference code): max
                abs waveform error must be < 1e-3.
  --feat_path   vocode an idx2feat file to wavs (same contract as
                ``pyscripts/feat_to_wav.py`` with --vocoder hifigan).

The golden pytest (tests/test_vocoder_golden.py) runs the selftest whenever
``SPEECHAIN_HIFIGAN_CKPT`` points at an existing file.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def torch_hifigan_forward(state_dict, mel_btm: "np.ndarray",
                          config=None) -> "np.ndarray":
    """Run the HiFi-GAN generator math directly in torch from a raw
    (possibly weight-normed) state dict — an independent execution path
    used to validate the flax remap. mel: (B, T, n_mels) -> (B, T*prod)."""
    import torch
    import torch.nn.functional as F

    from speechain_tpu.nn.vocoder_hifigan import (HIFIGAN_DEFAULT_CONFIG,
                                                  _fold_weight_norm)

    cfg = {**HIFIGAN_DEFAULT_CONFIG, **(config or {})}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def w(prefix):
        if prefix + ".weight_g" in sd:
            return torch.as_tensor(_fold_weight_norm(sd, prefix))
        return torch.as_tensor(sd[prefix + ".weight"])

    def b(prefix):
        return torch.as_tensor(sd[prefix + ".bias"])

    lrelu = 0.1
    x = torch.as_tensor(np.transpose(mel_btm, (0, 2, 1)))  # (B, C, T)
    x = F.conv1d(x, w("conv_pre"), b("conv_pre"), padding=3)
    num_kernels = len(cfg["resblock_kernel_sizes"])
    for i, (f, k) in enumerate(zip(cfg["upsample_factors"],
                                   cfg["upsample_kernel_sizes"])):
        x = F.leaky_relu(x, lrelu)
        x = F.conv_transpose1d(x, w(f"ups.{i}"), b(f"ups.{i}"),
                               stride=f, padding=(k - f) // 2)
        xs = None
        for j, (rk, rds) in enumerate(zip(cfg["resblock_kernel_sizes"],
                                          cfg["resblock_dilation_sizes"])):
            r = i * num_kernels + j
            xt_in = x
            if cfg["resblock_type"] == "1":
                for di, d in enumerate(rds):
                    p1 = f"resblocks.{r}.convs1.{di}"
                    p2 = f"resblocks.{r}.convs2.{di}"
                    xt = F.leaky_relu(xt_in, lrelu)
                    xt = F.conv1d(xt, w(p1), b(p1), dilation=d,
                                  padding=(rk - 1) // 2 * d)
                    xt = F.leaky_relu(xt, lrelu)
                    xt = F.conv1d(xt, w(p2), b(p2), padding=(rk - 1) // 2)
                    xt_in = xt + xt_in
            else:
                for di, d in enumerate(rds):
                    p = f"resblocks.{r}.convs.{di}"
                    xt = F.leaky_relu(xt_in, lrelu)
                    xt = F.conv1d(xt, w(p), b(p), dilation=d,
                                  padding=(rk - 1) // 2 * d)
                    xt_in = xt + xt_in
            xs = xt_in if xs is None else xs + xt_in
        x = xs / num_kernels
    x = F.leaky_relu(x, lrelu)
    x = F.conv1d(x, w("conv_post"), b("conv_post"), padding=3)
    return torch.tanh(x)[:, 0].numpy()


def load_raw_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"],
                                                             dict):
        sd = sd["model"]
    return {k.replace("generator.", ""): np.asarray(v)
            for k, v in sd.items()}


def selftest(ckpt: str, config=None, atol: float = 1e-3) -> dict:
    """Load `ckpt` via the production flax remap, vocode a deterministic
    synthetic mel, and compare sample-exactly with the independent torch
    execution. Returns a stats dict; raises AssertionError on mismatch."""
    import jax

    from speechain_tpu.nn.vocoder_hifigan import load_hifigan_vocoder

    rs = np.random.RandomState(0)
    n_mels = (config or {}).get("in_channels", 80)
    mel = (rs.standard_normal((1, 32, n_mels)) * 1.5 - 4.0).astype(
        np.float32)

    model, variables = load_hifigan_vocoder(ckpt, config)
    wav_jax = np.asarray(jax.jit(model.apply)(variables, mel))

    sd = load_raw_state_dict(ckpt)
    wav_torch = torch_hifigan_forward(sd, mel, config)

    assert wav_jax.shape == wav_torch.shape, (wav_jax.shape,
                                              wav_torch.shape)
    err = float(np.abs(wav_jax - wav_torch).max())
    assert np.isfinite(wav_jax).all()
    assert err < atol, f"flax/torch waveform mismatch: max abs err {err}"
    return dict(n_samples=int(wav_jax.size), max_abs_err=err,
                rms=float(np.sqrt((wav_jax ** 2).mean())))


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="speechain-vocoder",
        description="Vocode with a local HiFi-GAN torch checkpoint.")
    p.add_argument("--ckpt", required=True,
                   help="local .pt/.pth/.ckpt HiFi-GAN generator file")
    p.add_argument("--selftest", action="store_true",
                   help="validate the checkpoint remap against an "
                        "independent torch execution and exit")
    p.add_argument("--feat_path", default=None, help="idx2feat file")
    p.add_argument("--save_path", default=None)
    p.add_argument("--sr", type=int, default=22050)
    p.add_argument("--stream_chunk", type=int, default=0,
                   help="vocode in exact streaming chunks of N mel frames "
                        "(infer/streaming_tts.py): one fixed-shape dispatch "
                        "per chunk, first audio after chunk+2*margin frames "
                        "instead of the whole utterance; reports per-chunk "
                        "latency. 0 = whole-utterance dispatch")
    args = p.parse_args(argv)

    if args.selftest:
        stats = selftest(args.ckpt)
        print(f"selftest OK: {stats['n_samples']} samples, "
              f"max flax/torch err {stats['max_abs_err']:.2e}, "
              f"rms {stats['rms']:.3f}")
        return 0

    if not args.feat_path or not args.save_path:
        p.error("--feat_path and --save_path required unless --selftest")

    import jax

    from speechain_tpu.nn.vocoder_hifigan import load_hifigan_vocoder
    from speechain_tpu.utils.fileio import (read_data_by_path,
                                            read_idx2data_file,
                                            write_idx2data_file, write_wav)

    model, variables = load_hifigan_vocoder(args.ckpt)
    voc = apply = None
    if args.stream_chunk > 0:
        from speechain_tpu.infer.streaming_tts import StreamingVocoder
        voc = StreamingVocoder(model, variables,
                               chunk_frames=args.stream_chunk)
        print(f"streaming: chunk={voc.C} margin={voc.M} mel frames "
              f"({voc.C * voc.U} samples/chunk)")
    else:
        apply = jax.jit(model.apply)
    idx2feat = read_idx2data_file(args.feat_path)
    os.makedirs(args.save_path, exist_ok=True)
    idx2wav = {}
    for idx, fpath in idx2feat.items():
        mel = np.asarray(read_data_by_path(fpath), np.float32)[None]
        if voc is not None:
            import time
            t0, chunks, ticks = time.perf_counter(), [], []
            for c in voc.stream(mel):
                ticks.append(time.perf_counter() - t0)
                chunks.append(c)
            wav = np.concatenate(chunks, axis=1)[0]
            print(f"[{idx}] first audio {ticks[0] * 1e3:.1f} ms, "
                  f"{len(chunks)} chunks, total {ticks[-1] * 1e3:.1f} ms")
        else:
            wav = np.asarray(apply(variables, mel))[0]
        out = os.path.join(args.save_path, f"{idx}.wav")
        write_wav(out, wav, args.sr)
        idx2wav[idx] = out
    write_idx2data_file(idx2wav,
                        os.path.join(args.save_path, "idx2wav"))
    print(f"vocoded {len(idx2wav)} utterances -> {args.save_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
