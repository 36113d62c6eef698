"""Deep validation visualization (train/visualizer.py): per-sample metric
curves, audio/real-text first-interval snapshots, hypothesis-text history,
per-layer/head attention grids + .npz dumps.

Mirrors the reference's model.visualize() artifact tree
(model/ar_asr.py:602-727, model/ar_tts.py:552-670, snapshooter.py:380-800,
monitor.py:741-771): figures/<sample>/{metric curves, real_text.txt,
hypo_text.txt, input_audio_*.wav, <att_group>/epoch<N>.{png,npz}}.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
from speechain_tpu.models.ar_tts import ARTTSConfig, ARTTSNet
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig
from speechain_tpu.train.monitor import SnapShooter
from speechain_tpu.train.visualizer import ValidVisualizer, _ctc_collapse

RNG = jax.random.PRNGKey(0)
D = 32


class FakeTokenizer:
    sos_eos_idx, ignore_idx, unk_idx = 19, 0, 1

    def tensor2text(self, tensor):
        return "".join(chr(ord("a") + int(i) % 26)
                       for i in np.asarray(tensor).tolist()
                       if int(i) not in (0, 1, 19))


def _asr_net(ctc: bool = False):
    cfg = ARASRConfig(
        vocab_size=20,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=20), specaug=None,
        enc_prenet=dict(conv_dims=[16], lnr_dims=D),
        encoder=dict(d_model=D, num_heads=2, num_layers=2, fdfwd_dim=64),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=2, num_layers=1, fdfwd_dim=64),
        ctc_weight=0.3 if ctc else 0.0)
    return ARASRNet(cfg=cfg), cfg


def _asr_batch(B=4, T=4000, L=6):
    rng = np.random.RandomState(0)
    return dict(
        feat=rng.randn(B, T, 1).astype(np.float32) * 0.1,
        feat_len=np.full((B,), T, np.int32),
        text=rng.randint(2, 19, size=(B, L)).astype(np.int32),
        text_len=np.full((B,), L, np.int32),
        indices=[f"utt_{i:02d}" for i in range(B)],
        raw_text=["abcd"] * B)


def test_ctc_collapse():
    assert _ctc_collapse(np.array([0, 3, 3, 0, 3, 5, 5, 0])) == [3, 3, 5]
    assert _ctc_collapse(np.array([0, 0, 0])) == []


def test_asr_artifact_tree(tmp_path):
    net, cfg = _asr_net(ctc=True)
    b = _asr_batch()
    variables = net.init(
        {"params": RNG, "dropout": RNG, "specaug": RNG},
        jnp.asarray(b["feat"]), jnp.asarray(b["feat_len"]),
        jnp.asarray(b["text"]), jnp.asarray(b["text_len"]), train=False)

    shooter = SnapShooter(str(tmp_path))
    vis = ValidVisualizer("asr", shooter, tokenizer=FakeTokenizer(),
                          net_cfg=cfg, snapshot_number=2,
                          snapshot_interval=5, sample_rate=8000)
    vis.maybe_select(b)
    assert [s["name"] for s in vis.samples] == ["utt_00", "utt_01"]

    assert not vis.due(3)
    for epoch in (5, 10):
        assert vis.due(epoch)
        vis.snapshot(epoch, net, variables, RNG)
    shooter.wait_empty()
    shooter.close()

    fig = os.path.join(str(tmp_path), "figures")
    for name in ("utt_00", "utt_01"):
        sub = os.path.join(fig, name)
        # metric-history curves (reference curve plot per sample)
        for metric in ("cer", "wer", "accuracy", "text_confid", "loss",
                       "ctc_cer", "ctc_wer"):
            assert os.path.exists(os.path.join(sub, f"{metric}.png")), metric
            assert os.path.exists(os.path.join(sub, f"{metric}.txt")), metric
        # two snapshots -> two history points with epoch x-axis
        data = np.loadtxt(os.path.join(sub, "cer.txt"))
        assert data.shape == (2, 2) and list(data[:, 0]) == [5.0, 10.0]
        # first-interval audio + real text (ar_asr.py:672-700)
        assert os.path.exists(os.path.join(sub, "input_audio_5.wav"))
        with open(os.path.join(sub, "real_text.txt")) as f:
            assert "abcd" in f.read()
        # hypothesis history: one line per snapshot epoch
        for fname in ("hypo_text.txt", "hypo_ctc_text.txt"):
            with open(os.path.join(sub, fname)) as f:
                lines = f.read().splitlines()
            assert len(lines) == 2
            assert lines[0].startswith("5\t") and lines[1].startswith("10\t")
        # per-layer/head attention grids + npz dumps (abs.py:690-760)
        for group, n_l, n_h in (("enc_att", 2, 2), ("dec_self_att", 1, 2),
                                ("dec_cross_att", 1, 2)):
            gdir = os.path.join(sub, group)
            for epoch in (5, 10):
                png = os.path.join(gdir, f"epoch{epoch}.png")
                npz = os.path.join(gdir, f"epoch{epoch}.npz")
                assert os.path.exists(png), (group, epoch)
                mats = np.load(npz)
                # negative layer indices, one entry per head
                assert len(mats.files) == n_l * n_h, (group, mats.files)
                assert f"{-n_l}.0" in mats.files
                assert mats[f"-1.{n_h - 1}"].ndim == 2

    # records survive a state_dict round-trip (resume path)
    sd = vis.state_dict()
    vis2 = ValidVisualizer("asr", shooter, snapshot_number=2,
                           snapshot_interval=5)
    vis2.load_state_dict(sd)
    assert vis2.records["utt_00"]["cer"] == vis.records["utt_00"]["cer"]
    assert vis2.texts["utt_00"]["hypo_text"] == \
        vis.texts["utt_00"]["hypo_text"]


def test_tts_artifact_tree(tmp_path):
    cfg = ARTTSConfig(
        vocab_size=20,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=20),
        enc_emb=dict(embedding_dim=D), enc_prenet=None,
        encoder=dict(d_model=D, num_heads=2, num_layers=1, fdfwd_dim=64),
        dec_prenet=dict(lnr_dims=[D]),
        decoder=dict(d_model=D, num_heads=2, num_layers=2, fdfwd_dim=64),
        reduction_factor=2)
    net = ARTTSNet(cfg=cfg)
    rng = np.random.RandomState(1)
    B, L, T = 2, 6, 4000
    b = dict(text=rng.randint(2, 19, size=(B, L)).astype(np.int32),
             text_len=np.full((B,), L, np.int32),
             feat=rng.randn(B, T, 1).astype(np.float32) * 0.1,
             feat_len=np.full((B,), T, np.int32),
             indices=["tts_a", "tts_b"], raw_text=["abcd"] * B)
    variables = net.init(
        {"params": RNG, "dropout": RNG},
        jnp.asarray(b["text"]), jnp.asarray(b["text_len"]),
        jnp.asarray(b["feat"]), jnp.asarray(b["feat_len"]), train=False)

    shooter = SnapShooter(str(tmp_path))
    vis = ValidVisualizer("artts", shooter, tokenizer=FakeTokenizer(),
                          net_cfg=cfg, snapshot_number=1,
                          snapshot_interval=2, sample_rate=8000)
    vis.maybe_select(b)
    vis.snapshot(2, net, variables, RNG)
    vis.snapshot(4, net, variables, RNG)
    shooter.wait_empty()
    shooter.close()

    sub = os.path.join(str(tmp_path), "figures", "tts_a")
    for metric in ("loss", "stop_accuracy", "stop_f2", "feat_loss_after"):
        assert os.path.exists(os.path.join(sub, f"{metric}.png")), metric
    # raw-wave TTS target -> audio snapshot at the first interval
    assert os.path.exists(os.path.join(sub, "input_audio_2.wav"))
    assert os.path.exists(os.path.join(sub, "real_text.txt"))
    # teacher-forced predicted features every interval
    for epoch in (2, 4):
        assert os.path.exists(os.path.join(sub, f"pred_feat_{epoch}.png"))
    for group in ("dec_self_att", "dec_cross_att"):
        mats = np.load(os.path.join(sub, group, "epoch4.npz"))
        assert len(mats.files) == 2 * 2  # 2 layers x 2 heads


def test_visualizer_disabled_and_failsafe(tmp_path):
    """snapshot_number=0 disables selection; a broken model never raises
    out of snapshot() (the runner's training loop must survive,
    reference monitor.py enqueue try/except)."""
    shooter = SnapShooter(str(tmp_path))
    vis = ValidVisualizer("asr", shooter, snapshot_number=0,
                          snapshot_interval=5)
    vis.maybe_select(_asr_batch())
    assert vis.samples == [] and not vis.due(5)

    vis2 = ValidVisualizer("asr", shooter, snapshot_number=1,
                           snapshot_interval=1)
    vis2.maybe_select(_asr_batch())

    class Broken:
        def apply(self, *a, **k):
            raise RuntimeError("boom")

    vis2.snapshot(1, Broken(), {}, RNG)  # must not raise
    shooter.close()
