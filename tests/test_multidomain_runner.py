"""Multi-dataloader (semi-supervised chain) CLI training: two named streams
with per-domain losses and loss_weights through the runner."""

import os

import pytest

from test_runner import CONFIG_TEMPLATE, make_dataset

pytestmark = pytest.mark.slow

MULTI_CFG = """
data_root: {root}
num_epochs: 2
seed: 3
report_per_steps: 5
visual_snapshot_interval: 2
visual_snapshot_number: 1

loss_weights:
  real: 1.0
  syn: 0.5

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
            wav: !ref <data_root>/valid/idx2wav
            text: !ref <data_root>/valid/idx2text
        shuffle: True
        batch_size: 6
  valid:
    type: abs
    conf:
      dataset_type: speech_text
      dataset_conf:
        main_data:
          wav: !ref <data_root>/test/idx2wav
          text: !ref <data_root>/test/idx2text
      shuffle: False
      batch_size: 6

train_cfg:
  model:
    model_type: ar_asr.MultiDataLoaderARASR
    model_conf:
      customize_conf:
        token_type: char
        token_path: !ref <data_root>/token
        label_smoothing: 0.0
    module_conf:
      frontend:
        conf: {{sr: 8000, n_mels: 40, win_length: 0.025, hop_length: 0.01}}
      normalize: True
      enc_prenet:
        conf: {{conv_dims: [16, 16], lnr_dims: 48}}
      encoder:
        conf: {{d_model: 48, num_heads: 4, num_layers: 1, fdfwd_dim: 96}}
      dec_emb:
        conf: {{embedding_dim: 48}}
      decoder:
        conf: {{d_model: 48, num_heads: 4, num_layers: 1, fdfwd_dim: 96}}
  optim_sches:
    type: noam
    conf:
      optim_conf: {{lr: 0.003}}
      warmup_steps: 20
"""


@pytest.mark.slow
def test_multidomain_cli_training(tmp_path):
    from speechain_tpu import runner

    root = make_dataset(str(tmp_path / "data"), n_train=12, n_valid=12,
                        n_test=6)
    cfg_path = str(tmp_path / "chain_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(MULTI_CFG.format(root=root))
    exp = str(tmp_path / "exp")
    args = runner.parse_args(["--config", cfg_path, "--train",
                              "--result_path", exp,
                              "--time_bucket", "1600"])
    cfg = runner.merge_config(args)
    runner.train_main(cfg, args)
    assert os.path.exists(os.path.join(exp, "checkpoint"))
    # per-domain metrics must appear in the log
    log = open(os.path.join(exp, "train.log")).read()
    assert "real_ce_loss" in log and "syn_ce_loss" in log
    # visualization runs for multi-domain models too (reference picks one
    # visual domain, runner.py:994-1007): epoch-2 snapshot of 1 sample
    import re
    fig = os.path.join(exp, "figures")
    subs = [d for d in os.listdir(fig) if re.fullmatch(r"test_\d+", d)]
    assert len(subs) == 1, sorted(os.listdir(fig))
    sd = os.path.join(fig, subs[0])
    assert os.path.exists(os.path.join(sd, "accuracy.png"))
    assert os.path.exists(os.path.join(sd, "hypo_text.txt"))
