"""Benchmark: ASR training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full jitted train step (fp32 log-Mel frontend + feature norm +
SpecAugment + Conv2d prenet + conformer-small encoder + transformer decoder
+ CE/CTC loss + grads + Adam update) on a Mini-LibriSpeech-like workload:
batch of 8 s utterances, bf16 matmul compute, fp32 params/frontend.

vs_baseline derivation: the reference publishes no throughput numbers, only
wall-clock (BASELINE.md): Mini LibriSpeech conformer-small, 1x RTX 3090,
~4 h for the recipe's 100 epochs over train-clean-5 (~5 h of audio
incl. validation overhead). 5 h * 100 epochs / 4 h wall = 125x realtime
audio consumption ~= 45,000 mel-frames/s sustained. We report mel frames
consumed per second per chip against that estimate; >1.0 means faster than
the reference's GPU recipe per chip.
"""

import json
import os
import sys
import threading
import time

REF_FRAMES_PER_SEC = 45_000.0

# benched ASR architecture dims, shared by the train/decode sections and
# the anchored-FLOPs baselines (reference 5-bpe1k_conformer-small)
ARCH = {"V": 1000, "D": 256, "L": 32, "T": 8 * 16000}

_T0 = time.perf_counter()
_LAST_PROGRESS = [time.perf_counter()]

# accumulated result fields: sections update this as they complete, so a
# failure (or the watchdog) still emits every metric measured so far
_METRICS = {
    "metric": "asr_train_melframes_per_sec_per_chip",
    "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
}


def _progress(msg):
    # stderr only: stdout must stay a single JSON line for the driver
    _LAST_PROGRESS[0] = time.perf_counter()
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _start_watchdog():
    """Emit an error JSON line and exit if the run wedges.

    The device link dials a remote relay at ``import jax``; when the relay
    is down the import (or any first compile) blocks forever, and the
    driver would record NO bench line at all. Two trip-wires: no progress
    for BENCH_IDLE_SECS (default 20 min — the longest legitimate silent
    stretch is the first XLA compile at ~4-8 min), or total runtime past
    BENCH_MAX_SECS (default 90 min)."""
    idle_max = float(os.environ.get("BENCH_IDLE_SECS", "1200"))
    hard_max = float(os.environ.get("BENCH_MAX_SECS", "5400"))

    def watch():
        while True:
            time.sleep(30)
            now = time.perf_counter()
            idle, total = now - _LAST_PROGRESS[0], now - _T0
            if idle > idle_max or total > hard_max:
                why = (f"no progress for {idle:.0f}s"
                       if idle > idle_max else f"runtime {total:.0f}s")
                print(f"[bench] WATCHDOG: {why}; device link presumed "
                      f"wedged — emitting error line", file=sys.stderr,
                      flush=True)
                print(json.dumps({
                    **_METRICS,
                    "error": f"watchdog: {why} (device link unreachable?)",
                }), flush=True)
                os._exit(2)

    threading.Thread(target=watch, daemon=True).start()


def main():
    _start_watchdog()
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: repeated bench runs skip the multi-
    # minute XLA compiles on this 1-core host
    try:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/speechain_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from speechain_tpu.utils.hardware import enable_hardware_rng
    rbg = enable_hardware_rng()
    _progress(f'hardware rng: {rbg}')

    from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
    from speechain_tpu.ops.feat_norm import FeatNormConfig
    from speechain_tpu.ops.frontend import FrontendConfig
    from speechain_tpu.ops.specaug import SpecAugmentConfig
    from speechain_tpu.parallel.mesh import make_mesh, train_step_under_mesh
    from speechain_tpu.train.optim import build_optimizer
    from speechain_tpu.train.state import init_train_state, make_arasr_step

    # conformer-small (reference 5-bpe1k_conformer-small: d_model 256,
    # 12 conformer layers, 6 decoder layers, bpe1k vocab)
    V, D = ARCH["V"], ARCH["D"]
    cfg = ARASRConfig(
        vocab_size=V,
        frontend=FrontendConfig(n_mels=80, preemphasis=0.97),
        feat_norm=FeatNormConfig(feat_dim=80),
        specaug=SpecAugmentConfig(freq_mask_width=27, time_mask_width=0.05),
        enc_prenet=dict(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                        conv_batchnorm=True, conv_activation="LeakyReLU",
                        lnr_dims=D),
        encoder_type="conformer",
        # BENCH_REMAT=1: per-layer backward rematerialization — the A/B
        # lever for the B=256 working-set regression (docs/BENCHMARKS.md)
        encoder=dict(d_model=D, num_heads=4, num_layers=12, fdfwd_dim=4 * D,
                     fdfwd_activation="GELU",
                     remat=os.environ.get("BENCH_REMAT", "") == "1"),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=6, fdfwd_dim=4 * D,
                     fdfwd_activation="GELU",
                     remat=os.environ.get("BENCH_REMAT", "") == "1"),
        ctc_weight=0.3,
        label_smoothing=0.1,
        dtype=jnp.bfloat16,
    )
    net = ARASRNet(cfg=cfg)

    # B=128 by default — the measured sweet spot on v5e: 639k frames/s vs
    # 576k at B=64 (fixed per-step cost amortizes) and 530k at B=256
    # (something saturates; see docs/BENCHMARKS.md batch-scaling table).
    B = int(os.environ.get("BENCH_BATCH", "128"))
    L, T = ARCH["L"], ARCH["T"]
    SECS = T // 16000
    rng = jax.random.PRNGKey(0)
    batch = dict(
        feat=jax.random.normal(rng, (B, T, 1)) * 0.1,
        feat_len=jnp.full((B,), T, jnp.int32),
        text=jax.random.randint(rng, (B, L), 2, V).astype(jnp.int32),
        text_len=jnp.full((B,), L, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )
    tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
    N = int(os.environ.get("BENCH_CHAIN_STEPS", "30"))
    mesh = make_mesh(n_data=len(jax.devices()))

    # Measurement protocol (docs/BENCHMARKS.md "methodology"): the remote
    # device link can acknowledge async dispatches AND block_until_ready
    # before real completion, so only a host VALUE copy is a hard barrier.
    # The timed region runs N chained steps (each consumes the previous
    # step's donated state, fresh fold_in rng each step) and then copies
    # the FINAL loss to host: its value depends on every update in the
    # chain, so the copy completes only after all N steps really executed.
    #
    # Kernel-fallback ladder: a Pallas kernel that fails to lower on this
    # backend must degrade the number, not zero the benchmark. Each rung
    # additionally disables one kernel family (flags read at trace time,
    # ops/*.py *_enabled()) and rebuilds params + step from scratch.
    LADDER = (None, "SPEECHAIN_DISABLE_FUSED_CONVMOD",
              "SPEECHAIN_DISABLE_FLASH_ATT", "SPEECHAIN_DISABLE_PALLAS")
    def time_train():
        """Init params, build + compile the step, time 2 x N chained steps.
        Returns (best seconds per N-step chain, final state)."""
        _progress('init params (jitted)')
        variables = jax.jit(
            lambda r, f, fl, t, tl: net.init(
                {"params": r, "dropout": r, "specaug": r}, f, fl, t, tl,
                train=False)
        )(rng, batch["feat"], batch["feat_len"], batch["text"],
          batch["text_len"])
        jax.block_until_ready(variables)
        st = init_train_state(variables, tx)
        _progress('building train step')
        jstep = train_step_under_mesh(
            make_arasr_step(net, cfg, tx, axis_name="data"), mesh)
        # warmup / compile; the host copy absorbs the compile backlog
        st, m = jstep(st, batch, rng)
        np.asarray(m["loss"])

        _progress('train step compiled; timing')
        best_dt = None
        for trial in range(2):
            t0 = time.perf_counter()
            for i in range(N):
                st, m = jstep(st, batch,
                              jax.random.fold_in(rng, 1000 * trial + i))
            final_loss = float(np.asarray(m["loss"]))
            dt_i = time.perf_counter() - t0
            best_dt = dt_i if best_dt is None else min(best_dt, dt_i)
            _progress(f'trial {trial}: {dt_i / N * 1e3:.1f} ms/step '
                      f'loss={final_loss:.2f}')
        assert np.isfinite(final_loss), f"loss={final_loss}"
        return best_dt, st

    dt = state = None
    for rung, flag in enumerate(LADDER):
        if flag is not None:
            os.environ[flag] = "1"
            _METRICS["kernel_fallback"] = flag
            _progress(f'train attempt {rung}: retrying with {flag}=1')
        try:
            dt, state = time_train()
            break
        except Exception as e:                  # noqa: BLE001 — ladder rung
            _progress(f'train attempt {rung} failed: {type(e).__name__}: '
                      f'{str(e)[:300]}')
            if flag == LADDER[-1]:
                print(json.dumps({**_METRICS,
                                  "error": f"train bench failed on every "
                                           f"kernel rung: {e!r:.300}"}),
                      flush=True)
                return

    # A/B guards for the newest fused paths: a fused path could LOWER
    # fine but run slow (cf. the pallas-in-scan pathology,
    # docs/BENCHMARKS.md) — that would silently cap the headline number.
    # Unless a ladder rung already disabled it, also time each
    # family-disabled step once and keep the faster. Disable with
    # BENCH_AB=0.
    ab = os.environ.get("BENCH_AB", "1")
    if ("kernel_fallback" not in _METRICS and ab != "0"
            and (ab == "force" or jax.default_backend() != "cpu")):
        # (family, probe flag, value, baseline-is-fused?): convmod defaults
        # fused (probe = off); the prenet XLA core defaults OFF since the
        # r5 A/B measured it 28.7 ms/step slower (patch-matrix layout) —
        # its probe forces it ON so a layout fix would be noticed.
        for fam, flag, val, base_fused in (
                ("convmod", "SPEECHAIN_DISABLE_FUSED_CONVMOD", "1", True),
                ("prenet", "SPEECHAIN_FORCE_FUSED_PRENET", "xla", False)):
            base_key = "on" if base_fused else "off"
            probe_key = "off" if base_fused else "on"
            _METRICS[f"ab_{fam}_{base_key}_ms_per_step"] = round(
                dt / N * 1e3, 2)
            try:
                os.environ[flag] = val
                _progress(f'A/B: re-timing with the fused {fam} '
                          f'{"disabled" if base_fused else "forced on"}')
                dt2, state2 = time_train()
                _METRICS[f"ab_{fam}_{probe_key}_ms_per_step"] = round(
                    dt2 / N * 1e3, 2)
                if dt2 < dt:
                    dt, state = dt2, state2
                    _METRICS["kernel_fallback"] = (
                        f"{flag}={val} (A/B: "
                        f"{'unfused' if base_fused else 'fused'} "
                        f"{fam} faster)")
                else:
                    del os.environ[flag]
            except Exception as e:              # noqa: BLE001 — A/B is best-
                _progress(f'A/B {fam} attempt failed (keeping the default '
                          f'path): {type(e).__name__}: {str(e)[:200]}')
                os.environ.pop(flag, None)

    n_chips = len(jax.devices())
    mel_frames = B * (T // 160 + 1)  # 10 ms hop
    frames_per_sec = mel_frames * N / dt / n_chips
    value = round(frames_per_sec, 1)
    _progress(f'train: {dt / N * 1e3:.2f} ms/step '
              f'-> {value:,.0f} frames/s/chip')
    _METRICS.update(
        value=value,
        vs_baseline=round(frames_per_sec / REF_FRAMES_PER_SEC, 3))

    # ---- MFU (VERDICT r4 item 3): model FLOPs from utils/flops.py at the
    # benched architecture, fwd+bwd ~= 3x fwd, vs the detected chip's bf16
    # peak. The analytic counts are matmul MACs x 2 only (elementwise /
    # norm / softmax work excluded), so mfu_pct is a slight UNDER-estimate.
    try:
        from speechain_tpu.utils import flops as fl
        T_MEL = T // 160 + 1
        T_ENC = (T_MEL + 3) // 4
        step_fwd = B * (
            fl.conv2d_subsample_prenet(T_MEL, 80, [D, D])
            + fl.conformer_encoder(T_ENC, 12, D, 4 * D)
            + fl.transformer_decoder(L, L, T_ENC, 6, D, 4 * D)
            + fl.linear(L, D, V))
        tflops_per_step = 3.0 * step_fwd / 1e12
        peak = _chip_peak_tflops(jax.devices()[0])
        model_tflops = tflops_per_step / (dt / N)
        _METRICS.update({
            "tflops_per_step": round(tflops_per_step, 3),
            "model_tflops_per_sec": round(model_tflops, 1),
        })
        if peak is not None:
            _METRICS.update({
                "mfu_pct": round(100.0 * model_tflops / peak, 1),
                "mfu_peak_tflops": peak,
                "mfu_method": "analytic matmul FLOPs (utils/flops.py), "
                              "fwd+bwd=3x fwd, vs chip bf16 peak",
            })
            _progress(f'MFU: {tflops_per_step:.2f} TFLOP/step, '
                      f'{model_tflops:.0f} TFLOP/s '
                      f'= {_METRICS["mfu_pct"]:.1f}% of {peak:.0f} peak')
        else:
            _progress(f'MFU: {tflops_per_step:.2f} TFLOP/step, '
                      f'{model_tflops:.0f} TFLOP/s (unknown chip peak)')
    except Exception as e:                      # noqa: BLE001 — reporting
        _progress(f'MFU computation failed: {type(e).__name__}: {e}')

    # ---- inference throughput: jitted beam-16 decode, worst case --------
    # Force the full max-length search (the upper bound; early stopping only
    # improves on this): eos is eligible only when its log-prob beats
    # threshold * best-other (both negative), so a hugely NEGATIVE threshold
    # makes the bar +inf and eos never fires. Same protocol as
    # docs/BENCHMARKS.md "Decoding".
    if os.environ.get("BENCH_TRAIN_ONLY", "") == "1":
        # batch-sweep / probe mode: skip the decode+TTS sections (their
        # numbers do not depend on BENCH_BATCH)
        print(json.dumps(_METRICS), flush=True)
        return
    try:
        _decode_bench(batch, net, state, n_chips, SECS)
    except Exception as e:                      # noqa: BLE001 — keep train #
        _progress(f'decode bench failed: {type(e).__name__}: {str(e)[:300]}')
        _METRICS["decode_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    try:
        _tts_bench(n_chips)
    except Exception as e:                      # noqa: BLE001 — keep train #
        _progress(f'TTS bench failed: {type(e).__name__}: {str(e)[:300]}')
        _METRICS["tts_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    _progress('done')
    print(json.dumps(_METRICS))


def _chip_peak_tflops(dev):
    """bf16 peak TFLOP/s for the detected accelerator, or None if the
    device kind is not recognized (published per-chip figures: v5e 197,
    v4 275, v5p 459, v6e 918)."""
    kind = getattr(dev, "device_kind", "") or ""
    k = kind.lower()
    for pat, peak in (("v5 lite", 197.0), ("v5lite", 197.0),
                      ("v5litepod", 197.0), ("v5e", 197.0),
                      ("v6 lite", 918.0), ("v6e", 918.0),
                      ("trillium", 918.0), ("v5p", 459.0),
                      ("v5", 459.0), ("v4", 275.0)):
        if pat in k:
            return peak
    return None


def _decode_bench(batch, net, state, n_chips, SECS):
    import jax
    import jax.numpy as jnp
    import numpy as np

    _progress('train bench done; building decoder')
    from speechain_tpu.infer.asr import make_asr_decoder
    DB = min(16, batch["feat"].shape[0])
    dbatch_feat = batch["feat"][:DB]
    dbatch_len = batch["feat_len"][:DB]
    decoder = make_asr_decoder(net, beam_size=16, eos_filtering=True,
                               eos_threshold=-1e9)
    # the train step donates its input state, so the init-time `variables`
    # buffers are gone — decode from the live post-training state
    dec_vars = {"params": state.params, **state.mutables}
    _progress('compiling decoder')
    out = decoder(dec_vars, dbatch_feat, dbatch_len)
    # host copy: block_until_ready alone can acknowledge early through the
    # remote link; a value copy cannot
    import numpy as _np
    _np.asarray(out["hypo_text"])
    _progress('decoder compiled; timing')
    n_dec = 5
    t0 = time.perf_counter()
    for r in range(n_dec):
        out = decoder(dec_vars, dbatch_feat + jnp.float32(1e-6 * (r + 1)),
                      dbatch_len)
        _np.asarray(out["hypo_text"])
    dec_dt = (time.perf_counter() - t0) / n_dec
    decode_utt_per_sec = DB / dec_dt / n_chips
    decode_rt_factor = DB * SECS / dec_dt / n_chips   # audio-seconds/second

    # ---- anchored reference baseline for decode ------------------------
    # Method (same anchor as REF_FRAMES_PER_SEC, utils/flops.py docstring):
    # the reference publishes wall-clock only for training, so its GPU's
    # effective FLOP/s is anchored as 45k mel-frames/s x the train step's
    # FLOPs/frame (fwd+bwd ~= 3x fwd, same architecture as ours), then
    # divided into the FLOPs the reference ALGORITHM spends per utterance:
    # its beam search re-forwards the full prefix per step with no KV cache
    # (infer_func/beam_search.py:299-474). Assuming decode runs at training
    # efficiency is GENEROUS to the reference (small-batch Python-loop
    # decode utilizes a GPU far worse), so vs_baseline is a lower bound.
    from speechain_tpu.utils import flops as fl
    ref_eff_flops, enc_fwd, T_ENC = _ref_anchor()
    V, D, L = ARCH["V"], ARCH["D"], ARCH["L"]
    L_DEC = max(int(T_ENC / 3.0), 2)          # = our forced full-length law
    ref_decode_flops = enc_fwd + fl.ref_beam_search_decoder_flops(
        L_DEC, T_ENC, 16, 6, D, 4 * D, V)
    ref_decode_utt_per_sec = ref_eff_flops / ref_decode_flops
    _progress(f'ref decode baseline: {ref_decode_utt_per_sec:.2f} utt/s '
              f'({ref_eff_flops / 1e12:.2f} TFLOP/s anchor, '
              f'{ref_decode_flops / 1e9:.0f} GFLOP/utt)')
    _METRICS.update({
        "decode_beam16_utt_per_sec_per_chip": round(decode_utt_per_sec, 2),
        "decode_beam16_realtime_factor_per_chip": round(decode_rt_factor, 1),
        "decode_vs_baseline": round(
            decode_utt_per_sec / ref_decode_utt_per_sec, 2),
        # unlike the measured train vs_baseline, the decode/TTS ratios rest
        # on the anchored-FLOPs estimate above — label them as such so the
        # JSON is self-describing
        "decode_baseline_method": "anchored_flops_estimate",
    })


def _ref_anchor():
    """(effective reference FLOP/s, encoder fwd FLOPs/utt, enc frames)."""
    from speechain_tpu.utils import flops as fl
    V, D, L, T = ARCH["V"], ARCH["D"], ARCH["L"], ARCH["T"]
    T_MEL = T // 160 + 1
    T_ENC = (T_MEL + 3) // 4                  # two stride-2 subsamples
    enc_fwd = (fl.conv2d_subsample_prenet(T_MEL, 80, [D, D])
               + fl.conformer_encoder(T_ENC, 12, D, 4 * D))
    dec_fwd = (fl.transformer_decoder(L, L, T_ENC, 6, D, 4 * D)
               + fl.linear(L, D, V))
    return REF_FRAMES_PER_SEC * 3.0 * (enc_fwd + dec_fwd) / T_MEL, \
        enc_fwd, T_ENC


def _tts_bench(n_chips):
    # ---- TTS synthesis throughput: FastSpeech2 + HiFiGAN ----------------
    # LJSpeech fastspeech2 recipe dims (recipes/tts/ljspeech/exp_cfg/
    # fastspeech2.yaml: d=384, 4+4 layers, ff=1536) + HiFiGAN V1. Static
    # full-capacity synthesis: F mel frames -> F*256 samples at 22.05 kHz,
    # the compute is shape-static so audio-seconds = F * hop regardless of
    # the predicted per-utterance lengths.
    import jax
    import jax.numpy as jnp
    import numpy as np

    _progress('building TTS synth (FastSpeech2 + HiFiGAN)')
    from speechain_tpu.models.nar_tts import (FastSpeech2Config,
                                              FastSpeech2Net)
    from speechain_tpu.nn.vocoder_hifigan import HiFiGAN
    from speechain_tpu.ops.frontend import FrontendConfig as FCfg
    from speechain_tpu.utils import flops as fl
    rng = jax.random.PRNGKey(0)
    TD, TV, TL = 384, 100, 100
    TF = int(os.environ.get("BENCH_TTS_FRAMES", "640"))   # smoke knob
    TB = int(os.environ.get("BENCH_TTS_BATCH", "16"))
    tts_cfg = FastSpeech2Config(
        vocab_size=TV,
        frontend=FCfg(sr=22050, n_mels=80, win_length=0.05,
                      hop_length=0.0125, fmin=125.0, fmax=7600.0,
                      return_energy=True),
        enc_emb=dict(embedding_dim=TD),
        encoder=dict(d_model=TD, num_heads=4, num_layers=4,
                     fdfwd_dim=4 * TD),
        decoder=dict(d_model=TD, num_heads=4, num_layers=4,
                     fdfwd_dim=4 * TD),
        max_frame_len=TF, dtype=jnp.bfloat16)
    tts_net = FastSpeech2Net(cfg=tts_cfg)
    voc = HiFiGAN(in_channels=80)
    tts_text = jax.random.randint(rng, (TB, TL), 2, TV).astype(jnp.int32)
    tts_tlen = jnp.full((TB,), TL, jnp.int32)
    tts_vars = jax.jit(lambda r, t, tl: tts_net.init(
        {"params": r, "dropout": r}, t, tl, train=False))(
        rng, tts_text, tts_tlen)
    voc_vars = jax.jit(voc.init)(rng, jnp.zeros((1, 16, 80), jnp.float32))

    @jax.jit
    def synth(tv, vv, text, text_len):
        out = tts_net.apply(tv, text, text_len, train=False, max_frames=TF)
        wav = voc.apply(vv, out["pred_after"].astype(jnp.float32))
        return wav.mean()                     # scalar barrier value

    _progress('compiling TTS synth')
    np.asarray(synth(tts_vars, voc_vars, tts_text, tts_tlen))
    _progress('TTS synth compiled; timing')
    n_tts, best_tts = 5, None
    for trial in range(2):
        t0 = time.perf_counter()
        for r in range(n_tts):
            np.asarray(synth(tts_vars, voc_vars,
                             tts_text + (trial * n_tts + r) % 2, tts_tlen))
        dt_t = time.perf_counter() - t0
        best_tts = dt_t if best_tts is None else min(best_tts, dt_t)
    tts_audio_secs = TB * TF * 0.0125         # 12.5 ms hop
    tts_rt_factor = tts_audio_secs * n_tts / best_tts / n_chips
    ref_eff_flops, _, _ = _ref_anchor()
    ref_tts_flops = (fl.fastspeech2_fwd_flops(TL, TF, TD, 4 * TD, 4, 4, 80)
                     + fl.hifigan_fwd_flops(TF))
    ref_tts_rt = ref_eff_flops / ref_tts_flops * TF * 0.0125
    _progress(f'TTS: {tts_rt_factor:.0f}x realtime '
              f'(ref baseline {ref_tts_rt:.0f}x, '
              f'{ref_tts_flops / 1e9:.0f} GFLOP/utt)')
    _METRICS.update({
        "tts_synth_realtime_factor_per_chip": round(tts_rt_factor, 1),
        "tts_vs_baseline": round(tts_rt_factor / ref_tts_rt, 2),
        "tts_baseline_method": "anchored_flops_estimate",
    })


if __name__ == "__main__":
    main()
