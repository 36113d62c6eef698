"""Speech-chain closure gate (VERDICT r2 item 5): the chain must HELP.

The framework's namesake loop is offline TTS->ASR semi-supervised training
(reference recipes/offline_tts2asr/tts_synthesize.sh:1-378 + the
multi-domain exp_cfg train-clean-100-360/exp_cfg/*.yaml:109-134). This test
closes the loop end-to-end through the user surface (runner CLI + chain
CLI) and asserts the OUTCOME, not just artifact shapes:

  1. train a FastSpeech2 TTS on its own tone corpus (runner --train) —
     mirroring the reference recipe, where the synthesizing TTS is
     trained on its own corpus (LibriTTS), not on the ASR's starved
     labels (tts_synthesize.sh:24-41 `tts_result_path`);
  2. synthesize pseudo speech for UNLABELED text via `speechain-chain
     synthesize` (Griffin-Lim vocoder) — the chain never sees this text's
     real audio;
  3. train ASR on real-only vs real+synthetic (multi-domain runner path);
  4. decode a held-out test set with both: the chain-trained ASR must be
     strictly better.

The ASR's labeled set is deliberately starved (12 utterances) so the
real-only baseline underfits the test distribution; the 48 synthesized
utterances widen token-sequence coverage, which is exactly the effect the
machine speech chain claims.
"""

import os

import numpy as np
import pytest

from test_runner import make_dataset

pytestmark = [pytest.mark.quality, pytest.mark.slow]

# FastSpeech2 teacher: the reference chain supports FS2 synthesis
# (tts_synthesize.sh:18) and it is the right teacher at this corpus size —
# AR-TTS attention cannot learn alignment from this little data (measured:
# synthesized tones carry ~chance token identity), while FS2's explicit
# durations make synthesis a per-token local mapping that a small model
# nails. Durations/pitch are exact by construction of the tone corpus
# (1200 samples/token = 15 frames at the 80-sample hop). Calibration
# (2026-08-17): with this exact config the synthesized unseen-text tones
# measure 0% token error by the gate below; at d_model=48/120 epochs they
# measure ~49% (near-neighbor frequency drift), so keep the capacity.
FS2_TTS_CFG = """
data_root: {root}
num_epochs: 250
seed: 1
report_per_steps: 100
early_stopping_patience: 100000
data_cfg:
  train:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/train/idx2wav
          text: !ref <data_root>/train/idx2text
          duration: !ref <data_root>/train/idx2duration
          pitch: !ref <data_root>/train/idx2pitch
      shuffle: True
      batch_size: 6
  valid:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/valid/idx2wav
          text: !ref <data_root>/valid/idx2text
          duration: !ref <data_root>/valid/idx2duration
          pitch: !ref <data_root>/valid/idx2pitch
      shuffle: False
      batch_size: 6
train_cfg:
  model:
    model_type: nar_tts.FastSpeech2
    model_conf:
      customize_conf:
        token_type: char
        token_path: !ref <data_root>/token
        reduction_factor: 1
    module_conf:
      frontend:
        # fmax MUST stay below Nyquist: the FastSpeech2Config default
        # (7600 Hz, an LJSpeech@22k value) leaves only ~17 usable mel bins
        # at sr 8000 with 150-300 Hz spacing around the tone range —
        # coarse enough that Griffin-Lim renders tones snapped to the
        # wrong 220 Hz-spaced neighbor (measured: 43% token fidelity with
        # perfect pitch/duration predictions; 4 kHz fmax fixes it)
        conf: {{sr: 8000, n_mels: 40, fmax: 4000.0, win_length: 0.02,
                hop_length: 0.01, return_energy: true}}
      normalize: True
      pitch_normalize: True
      energy_normalize: True
      enc_emb:
        conf: {{embedding_dim: 64}}
      encoder:
        conf: {{d_model: 64, num_heads: 4, num_layers: 2, fdfwd_dim: 128}}
      duration_predictor:
        conf: {{conv_dims: [64, 64], conv_kernel: 3}}
      pitch_predictor:
        conf: {{conv_dims: [64, 64], conv_kernel: 3}}
      energy_predictor:
        conf: {{conv_dims: [64, 64], conv_kernel: 3}}
      decoder:
        conf: {{d_model: 64, num_heads: 4, num_layers: 2, fdfwd_dim: 128}}
      postnet:
        conf: {{conv_dims: [64], conv_kernel: 5}}
  optim_sches:
    type: noam
    conf:
      optim_conf: {{lr: 0.003}}
      warmup_steps: 50
"""

TONE_TOKENS = "abcdefgh"
FRAMES_PER_TOKEN = 15          # 1200 samples / (0.01 s x 8 kHz) hop


def _write_fs2_targets(root, splits=("train", "valid")):
    """Exact duration/pitch targets from the tone corpus's construction:
    sos/eos get 0 frames (proc_duration keeps exact zeros), each char 15;
    per-frame pitch = the token's tone frequency."""
    from speechain_tpu.utils.fileio import read_idx2data_file

    for split in splits:
        d = os.path.join(root, split)
        idx2text = read_idx2data_file(os.path.join(d, "idx2text"))
        os.makedirs(os.path.join(d, "pitch"), exist_ok=True)
        with open(os.path.join(d, "idx2duration"), "w") as fd, \
                open(os.path.join(d, "idx2pitch"), "w") as fp:
            for idx, text in idx2text.items():
                durs = ["0"] + [str(FRAMES_PER_TOKEN)] * len(text) + ["0"]
                fd.write(f"{idx} {' '.join(durs)}\n")
                f0 = np.repeat(
                    [350.0 + 220.0 * TONE_TOKENS.index(c) for c in text],
                    FRAMES_PER_TOKEN).astype(np.float32)
                p = os.path.join(d, "pitch", idx + ".npy")
                np.save(p, f0)
                fp.write(f"{idx} {p}\n")


ASR_CFG_HEAD = """
data_root: {root}
syn_root: {syn}
num_epochs: {epochs}
seed: 11
report_per_steps: 20
best_model_num: 2
last_model_num: 1
early_stopping_patience: 100000
"""

REAL_ONLY_DATA = """
data_cfg:
  train:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/train/idx2wav
          text: !ref <data_root>/train/idx2text
      shuffle: True
      batch_size: 6
"""

CHAIN_DATA = """
data_cfg:
  train:
    real:
      type: abs
      conf:
        dataset_type: speech_text
        dataset_conf:
          main_data:
            wav: !ref <data_root>/train/idx2wav
            text: !ref <data_root>/train/idx2text
        shuffle: True
        batch_size: 6
    syn:
      type: abs
      conf:
        dataset_type: speech_text
        dataset_conf:
          main_data:
            wav: !ref <syn_root>/idx2wav
            text: !ref <data_root>/unlab/idx2text
        shuffle: True
        batch_size: 6
"""

ASR_CFG_TAIL = """
  valid:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/valid/idx2wav
          text: !ref <data_root>/valid/idx2text
      shuffle: False
      batch_size: 6
  test:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/test/idx2wav
          text: !ref <data_root>/test/idx2text
      shuffle: False
      batch_size: 8

train_cfg:
  model:
    model_type: ar_asr.ARASR
    model_conf:
      customize_conf:
        token_type: char
        token_path: !ref <data_root>/token
        label_smoothing: 0.0
    module_conf:
      frontend:
        conf: {sr: 8000, n_mels: 40, win_length: 0.025, hop_length: 0.01}
      normalize: True
      enc_prenet:
        conf: {conv_dims: [16, 16], lnr_dims: 48}
      encoder:
        type: transformer
        conf: {d_model: 48, num_heads: 4, num_layers: 2, fdfwd_dim: 96}
      dec_emb:
        conf: {embedding_dim: 48}
      decoder:
        conf: {d_model: 48, num_heads: 4, num_layers: 1, fdfwd_dim: 96}
  optim_sches:
    type: noam
    conf:
      optim_type: Adam
      optim_conf: {lr: 0.005}
      warmup_steps: 40

infer_cfg:
  beam_size: 4
"""


def _train_and_test_asr(cfg_text, tmp_path, name):
    from speechain_tpu import runner

    cfg_path = str(tmp_path / f"{name}.yaml")
    exp = str(tmp_path / f"exp_{name}")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600", "--num_workers", "1"])
    runner.train_main(runner.merge_config(args), args)
    targs = runner.parse_args(
        ["--config", cfg_path, "--test", "--result_path", exp,
         "--test_model", "latest", "--time_bucket", "1600",
         "--num_workers", "1"])
    results = runner.test_main(runner.merge_config(targs), targs)
    return results["test"]["wer"]


def test_chain_improves_asr_wer(tmp_path):
    from speechain_tpu import chain, runner
    from speechain_tpu.utils.fileio import read_idx2data_file

    # ASR labeled train (12) is starved; unlab (48) is text-only for the
    # chain; test (16) is the held-out gate. The TTS has its own corpus
    # (64) — the reference chain likewise synthesizes with a TTS trained
    # on its own data (LibriTTS), not on the ASR's labels.
    root = make_dataset(str(tmp_path / "data"), n_train=12, n_valid=6,
                        n_test=16, seed=0)
    tts_root = make_dataset(str(tmp_path / "tts_data"), n_train=64,
                            n_valid=8, n_test=1, seed=50)
    unlab = make_dataset(str(tmp_path / "unlab_src"), n_train=48, n_valid=1,
                         n_test=1, seed=100)
    os.makedirs(os.path.join(root, "unlab"), exist_ok=True)
    # the chain sees ONLY this text; its real audio never leaves unlab_src
    with open(os.path.join(unlab, "train", "idx2text")) as src, \
            open(os.path.join(root, "unlab", "idx2text"), "w") as dst:
        dst.write(src.read())

    # ---- 1. TTS on its own corpus ------------------------------------
    _write_fs2_targets(tts_root)
    tts_cfg = str(tmp_path / "tts_cfg.yaml")
    with open(tts_cfg, "w") as f:
        f.write(FS2_TTS_CFG.format(root=tts_root))
    tts_exp = str(tmp_path / "tts_exp")
    args = runner.parse_args(["--config", tts_cfg, "--train",
                              "--result_path", tts_exp,
                              "--time_bucket", "1600",
                              "--num_workers", "1"])
    runner.train_main(runner.merge_config(args), args)

    # ---- 2. synthesize pseudo speech for the unlabeled text ----------
    syn = str(tmp_path / "syn")
    chain.synthesize_main([
        "--config", tts_cfg, "--result_path", tts_exp,
        "--text", os.path.join(root, "unlab", "idx2text"),
        "--save_path", syn, "--max_frames", "120", "--gl_iters", "16",
        "--batch_size", "8"])
    idx2syn = read_idx2data_file(os.path.join(syn, "idx2wav"))
    assert len(idx2syn) == 48

    # teacher-quality gate: the synthesized audio must CARRY token
    # identity — without this the downstream WER comparison can "pass"
    # through decoder-LM regularization alone. Measured alignment-free:
    # classify each 50 ms frame by FFT-peak frequency, collapse runs
    # (>=5 frames) into a token string, and edit-distance it against the
    # run-collapsed reference (repeated tones have no boundary in either
    # signal, so both sides collapse). The same measure scores the REAL
    # corpus at 0% TER, so the bar below is all teacher+vocoder error.
    from speechain_tpu.utils.metrics import levenshtein_alignment
    import wave as wavemod
    idx2text = read_idx2data_file(os.path.join(root, "unlab", "idx2text"))
    freqs = 350.0 + 220.0 * np.arange(8)
    awin, ahop = 400, 80                           # 50 ms / 10 ms @ 8 kHz
    hann = np.hanning(awin)

    def _collapse(seq, min_run=1):
        out, prev, run = [], None, 0
        for c in seq:
            if c == prev:
                run += 1
            else:
                if prev is not None and run >= min_run:
                    out.append(prev)
                prev, run = c, 1
        if prev is not None and run >= min_run:
            out.append(prev)
        return out

    err = tot = 0
    for idx, path in idx2syn.items():
        with wavemod.open(path) as f:
            sr = f.getframerate()
            wav = np.frombuffer(f.readframes(f.getnframes()),
                                np.int16).astype(np.float32)
        n = 1 + (len(wav) - awin) // ahop if len(wav) >= awin else 0
        fr = [int(np.argmin(np.abs(
            freqs - np.argmax(np.abs(np.fft.rfft(
                wav[i * ahop:i * ahop + awin] * hann))) * sr / awin)))
            for i in range(n)]
        hyp = _collapse(fr, min_run=5)
        ref = _collapse([TONE_TOKENS.index(c) for c in idx2text[idx]])
        err += levenshtein_alignment(hyp, ref)["dist"]
        tot += len(ref)
    ter = err / max(tot, 1)
    assert ter <= 0.35, (
        f"pseudo speech does not carry token identity: TER {ter:.0%}")

    # ---- 3+4. real-only vs chain-trained ASR -------------------------
    # EQUAL optimizer-step budgets (~600 steps each): real-only runs 300
    # epochs x 2 steps over its 12 utterances, chain runs 60 epochs x
    # (2 real + 8 syn) steps — the comparison isolates DATA, not steps
    wer_real = _train_and_test_asr(
        ASR_CFG_HEAD.format(root=root, syn=syn, epochs=300)
        + REAL_ONLY_DATA + ASR_CFG_TAIL, tmp_path, "real_only")
    wer_chain = _train_and_test_asr(
        ASR_CFG_HEAD.format(root=root, syn=syn, epochs=60)
        + CHAIN_DATA + ASR_CFG_TAIL, tmp_path, "chain")

    # the chain must help, with margin: synthetic coverage of unseen token
    # sequences beats optimizing longer on 12 real utterances
    assert wer_chain < wer_real - 0.03, (
        f"speech chain failed to improve ASR: real-only WER {wer_real:.3f}"
        f" vs chain WER {wer_chain:.3f}")
