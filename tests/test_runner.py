"""End-to-end CLI runner test: synthetic on-disk tone dataset -> train ->
test with beam search -> WER report artifacts.

This exercises the full user path (the reference's recipes/run.sh ->
runner.py flow): idx2wav/idx2text/vocab files on disk, !ref YAML config,
epoch loop with checkpointing and early stopping, beam-search evaluation
with idx2cer/idx2wer/overall_results.md outputs.
"""

import os
import struct
import wave as wavemod

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def write_wav(path, wave_arr, sr=8000):
    data = (np.clip(wave_arr, -1, 1) * 32767).astype("<i2").tobytes()
    with wavemod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(data)


TOKENS = "abcdefgh"  # 8 tone classes


def make_dataset(root, n_train=24, n_valid=8, n_test=8, seed=0):
    rng = np.random.RandomState(seed)
    sr, tone_len = 8000, 1200
    vocab = ["<blank>", "<unk>"] + list(TOKENS) + ["<sos/eos>"]
    os.makedirs(os.path.join(root, "token"), exist_ok=True)
    with open(os.path.join(root, "token", "vocab"), "w") as f:
        f.write("\n".join(vocab) + "\n")

    for split, n in [("train", n_train), ("valid", n_valid),
                     ("test", n_test)]:
        d = os.path.join(root, split)
        os.makedirs(os.path.join(d, "wav"), exist_ok=True)
        idx2wav, idx2text, idx2len = {}, {}, {}
        for i in range(n):
            n_tok = int(rng.randint(3, 6))
            toks = rng.randint(0, len(TOKENS), size=n_tok)
            t = np.arange(tone_len) / sr
            sig = np.concatenate(
                [0.7 * np.sin(2 * np.pi * (350 + 220 * k) * t)
                 for k in toks]).astype(np.float32)
            idx = f"{split}_{i:03d}"
            path = os.path.join(d, "wav", idx + ".wav")
            write_wav(path, sig, sr)
            idx2wav[idx] = path
            idx2text[idx] = "".join(TOKENS[k] for k in toks)
            idx2len[idx] = len(sig)
        for name, data in [("idx2wav", idx2wav), ("idx2text", idx2text),
                           ("idx2wav_len", idx2len)]:
            with open(os.path.join(d, name), "w") as f:
                for k, v in data.items():
                    f.write(f"{k} {v}\n")
    return root


CONFIG_TEMPLATE = """
data_root: {root}
num_epochs: {epochs}
seed: 7
report_per_steps: 5
best_model_num: 2
last_model_num: 1

data_cfg:
  train:
    type: block
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/train/idx2wav
          text: !ref <data_root>/train/idx2text
      data_len: !ref <data_root>/train/idx2wav_len
      shuffle: True
      is_descending: True
      batch_len: 40000
  valid:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/valid/idx2wav
          text: !ref <data_root>/valid/idx2text
      data_len: !ref <data_root>/valid/idx2wav_len
      shuffle: False
      batch_size: 8
  test:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/test/idx2wav
          text: !ref <data_root>/test/idx2text
      data_len: !ref <data_root>/test/idx2wav_len
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
        conf:
          sr: 8000
          n_mels: 40
          win_length: 0.025
          hop_length: 0.01
      normalize: True
      enc_prenet:
        conf:
          conv_dims: [16, 16]
          lnr_dims: 48
      encoder:
        type: transformer
        conf:
          d_model: 48
          num_heads: 4
          num_layers: 2
          fdfwd_dim: 96
      dec_emb:
        conf:
          embedding_dim: 48
      decoder:
        conf:
          d_model: 48
          num_heads: 4
          num_layers: 1
          fdfwd_dim: 96
  optim_sches:
    type: noam
    conf:
      optim_type: Adam
      optim_conf:
        lr: 0.005
      warmup_steps: 40

infer_cfg:
  beam_size: 2
"""


@pytest.mark.slow
def test_runner_end_to_end(tmp_path):
    from speechain_tpu import runner

    root = make_dataset(str(tmp_path / "data"))
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(root=root, epochs=8))

    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    cfg = runner.merge_config(args)
    runner.train_main(cfg, args)

    assert os.path.exists(os.path.join(exp, "checkpoint"))
    assert os.path.exists(os.path.join(exp, "train.log"))
    models = os.listdir(os.path.join(exp, "models"))
    assert any(m.startswith("epoch_") for m in models)

    # deep validation-visualization artifacts (train/visualizer.py,
    # reference model.visualize ar_asr.py:602-727): default 3 samples /
    # interval 5 over 8 epochs -> one snapshot at epoch 5 per sample
    import re
    fig = os.path.join(exp, "figures")
    subs = sorted(d for d in os.listdir(fig)
                  if re.fullmatch(r"valid_\d+", d))
    assert len(subs) == 3, subs
    for sname in subs:
        sd = os.path.join(fig, sname)
        for metric in ("cer", "wer", "accuracy", "text_confid", "loss"):
            assert os.path.exists(os.path.join(sd, f"{metric}.png")), metric
        assert os.path.exists(os.path.join(sd, "input_audio_5.wav"))
        assert os.path.exists(os.path.join(sd, "real_text.txt"))
        with open(os.path.join(sd, "hypo_text.txt")) as f:
            assert f.read().startswith("5\t")
        for group in ("enc_att", "dec_self_att", "dec_cross_att"):
            mats = np.load(os.path.join(sd, group, "epoch5.npz"))
            assert len(mats.files) > 0, group
            assert os.path.exists(os.path.join(sd, group, "epoch5.png"))

    targs = runner.parse_args(
        ["--config", cfg_path, "--test", "--result_path", exp,
         "--test_model", "latest", "--time_bucket", "1600"])
    tcfg = runner.merge_config(targs)
    results = runner.test_main(tcfg, targs)
    assert "test" in results
    assert 0.0 <= results["test"]["wer"] <= 1.5
    out_dir = os.path.join(exp, "latest", "test")
    for artifact in ("idx2hypo_text", "idx2cer", "idx2wer",
                     "overall_results.md",
                     # default bad-case selection (ar_asr.py:330-339)
                     "top30_max_wer.md", "top30_min_text_confid.md"):
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact


def test_resume_restores_epoch(tmp_path):
    from speechain_tpu import runner

    root = make_dataset(str(tmp_path / "data"), n_train=8, n_valid=4,
                        n_test=4)
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(root=root, epochs=2))
    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    cfg = runner.merge_config(args)
    runner.train_main(cfg, args)

    # second run with more epochs resumes from the checkpoint
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(root=root, epochs=3))
    args2 = runner.parse_args(
        ["--config", cfg_path, "--train", "--resume", "--result_path", exp,
         "--time_bucket", "1600"])
    cfg2 = runner.merge_config(args2)
    runner.train_main(cfg2, args2)
    with open(os.path.join(exp, "checkpoint_meta.json")) as f:
        import json
        assert json.load(f)["epoch"] == 3


def test_data_cfg_flag_swaps_test_sets(tmp_path):
    """--data_cfg <yaml> replaces the exp_cfg data block at test time
    (reference runner.py data_cfg override; recipes/**/data_cfg grid)."""
    from speechain_tpu import runner

    root = make_dataset(str(tmp_path / "data"), n_train=10, n_valid=6,
                        n_test=6)
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(root=root, epochs=1))
    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    runner.train_main(runner.merge_config(args), args)

    alt_path = str(tmp_path / "alt_data.yaml")
    with open(alt_path, "w") as f:
        f.write(f"""root: {root}
data_cfg:
  alt-valid:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <root>/valid/idx2wav
          text: !ref <root>/valid/idx2text
      data_len: !ref <root>/valid/idx2wav_len
      shuffle: False
      batch_size: 8
""")
    targs = runner.parse_args(
        ["--config", cfg_path, "--test", "--data_cfg", alt_path,
         "--result_path", exp, "--test_model", "latest",
         "--time_bucket", "1600"])
    results = runner.test_main(runner.merge_config(targs), targs)
    assert set(results) == {"alt-valid"}
    out_dir = os.path.join(exp, "latest", "alt-valid")
    assert os.path.exists(os.path.join(out_dir, "overall_results.md"))
    assert os.path.exists(os.path.join(out_dir, "idx2hypo_text"))


def test_steps_per_dispatch_is_numerically_invisible(tmp_path):
    """--steps_per_dispatch K scans K same-shape batches in one executable;
    the step folds rng by state.step internally, so the final parameters
    must be bit-comparable to the single-step path."""
    import jax
    import numpy as onp

    from speechain_tpu import runner
    from speechain_tpu.train.checkpoint import CheckpointManager

    root = make_dataset(str(tmp_path / "data"), n_train=16, n_valid=4,
                        n_test=4)
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(root=root, epochs=2))

    params = {}
    for spd in (1, 4):
        exp = str(tmp_path / f"exp_spd{spd}")
        args = runner.parse_args(
            ["--config", cfg_path, "--train", "--result_path", exp,
             "--time_bucket", "1600", "--steps_per_dispatch", str(spd)])
        runner.train_main(runner.merge_config(args), args)
        state, _ = CheckpointManager(exp).restore_train_state(None)
        params[spd] = state["params"]

    for a, b in zip(jax.tree_util.tree_leaves(params[1]),
                    jax.tree_util.tree_leaves(params[4])):
        onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b),
                                    atol=2e-5)
