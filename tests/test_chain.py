"""Offline TTS->ASR chain: train a tiny TTS via the runner, synthesize
pseudo speech over unlabeled text through the chain CLI, verify the pseudo
idx2wav tree."""

import os

import numpy as np
import pytest

from test_runner import make_dataset

pytestmark = pytest.mark.slow


TTS_CFG = """
data_root: {root}
num_epochs: 2
seed: 1
report_per_steps: 5
visual_snapshot_interval: 1
visual_snapshot_number: 1
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
train_cfg:
  model:
    model_type: ar_tts.ARTTS
    model_conf:
      customize_conf:
        token_type: char
        token_path: !ref <data_root>/token
        reduction_factor: 2
    module_conf:
      frontend:
        conf: {{sr: 8000, n_mels: 20, win_length: 0.02, hop_length: 0.01}}
      normalize: True
      enc_emb:
        conf: {{embedding_dim: 32}}
      encoder:
        conf: {{d_model: 32, num_heads: 4, num_layers: 1, fdfwd_dim: 64}}
      dec_prenet:
        conf: {{lnr_dims: [32], lnr_dropout: 0.5}}
      decoder:
        conf: {{d_model: 32, num_heads: 4, num_layers: 1, fdfwd_dim: 64}}
      postnet:
        conf: {{conv_dims: [32], conv_kernel: 5}}
  optim_sches:
    type: noam
    conf:
      optim_conf: {{lr: 0.001}}
      warmup_steps: 20
"""


@pytest.mark.slow
def test_chain_synthesize_end_to_end(tmp_path):
    from speechain_tpu import chain, runner
    from speechain_tpu.utils.fileio import read_idx2data_file, read_wav

    root = make_dataset(str(tmp_path / "data"), n_train=12, n_valid=6,
                        n_test=4)
    cfg_path = str(tmp_path / "tts_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(TTS_CFG.format(root=root))
    exp = str(tmp_path / "exp")
    args = runner.parse_args(["--config", cfg_path, "--train",
                              "--result_path", exp,
                              "--time_bucket", "1600"])
    runner.train_main(runner.merge_config(args), args)

    # TTS validation-visualization artifacts (train/visualizer.py,
    # reference model/ar_tts.py:552-670): interval 1 x 2 epochs, 1 sample
    import re
    fig = os.path.join(exp, "figures")
    subs = [d for d in os.listdir(fig) if re.fullmatch(r"valid_\d+", d)]
    assert len(subs) == 1, subs
    sd = os.path.join(fig, subs[0])
    for metric in ("loss", "stop_accuracy", "feat_loss_after"):
        assert os.path.exists(os.path.join(sd, f"{metric}.png")), metric
    assert os.path.exists(os.path.join(sd, "input_audio_1.wav"))
    assert os.path.exists(os.path.join(sd, "real_text.txt"))
    for epoch in (1, 2):
        assert os.path.exists(os.path.join(sd, f"pred_feat_{epoch}.png"))
        assert os.path.exists(
            os.path.join(sd, "dec_cross_att", f"epoch{epoch}.npz"))

    syn = str(tmp_path / "syn")
    chain.synthesize_main([
        "--config", cfg_path, "--result_path", exp,
        "--text", os.path.join(root, "test", "idx2text"),
        "--save_path", syn, "--max_frames", "30", "--gl_iters", "8",
        "--batch_size", "4"])
    idx2wav = read_idx2data_file(os.path.join(syn, "idx2wav"))
    assert len(idx2wav) == 4
    wave, sr = read_wav(next(iter(idx2wav.values())))
    assert sr == 8000 and len(wave) > 0
    lens = read_idx2data_file(os.path.join(syn, "idx2wav_len"), int)
    assert all(v > 0 for v in lens.values())
