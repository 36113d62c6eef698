"""Train-step factories: LM, AR-TTS, FastSpeech2, multi-domain ASR under the
8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
from speechain_tpu.models.ar_tts import ARTTSConfig, ARTTSNet
from speechain_tpu.models.nar_tts import FastSpeech2Config, FastSpeech2Net
from speechain_tpu.nn.lm import LanguageModelNet, LMConfig
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig
from speechain_tpu.parallel.mesh import make_mesh, train_step_under_mesh
from speechain_tpu.train.optim import build_optimizer
from speechain_tpu.train.state import (
    init_train_state,
    make_artts_step,
    make_fastspeech2_step,
    make_lm_step,
    make_multi_domain_arasr_step,
)

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)
D = 32


def test_lm_step_trains():
    cfg = LMConfig(vocab_size=20, emb=dict(embedding_dim=D),
                   encoder=dict(d_model=D, num_heads=4, num_layers=2,
                                fdfwd_dim=64))
    net = LanguageModelNet(cfg=cfg)
    B, L = 8, 12
    text = jax.random.randint(RNG, (B, L), 1, 19)
    text_len = jnp.full((B,), L, jnp.int32)
    variables = net.init({"params": RNG, "dropout": RNG}, text, text_len)
    tx = build_optimizer(optim_conf={"lr": 3e-3}, warmup_steps=10)
    state = init_train_state(variables, tx)
    mesh = make_mesh(n_data=8)
    step = train_step_under_mesh(make_lm_step(net, tx), mesh,
                                 donate_state=False)
    batch = dict(text=text, text_len=text_len)
    losses = []
    for _ in range(20):
        state, m = step(state, batch, RNG)
        losses.append(float(m["ce_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_artts_step_runs():
    cfg = ARTTSConfig(
        vocab_size=20,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=20),
        enc_emb=dict(embedding_dim=D), enc_prenet=None,
        encoder=dict(d_model=D, num_heads=4, num_layers=1, fdfwd_dim=64),
        dec_prenet=dict(lnr_dims=[D], lnr_dropout=0.5),
        decoder=dict(d_model=D, num_heads=4, num_layers=1, fdfwd_dim=64),
        postnet=dict(conv_dims=[D], conv_kernel=5))
    net = ARTTSNet(cfg=cfg)
    B = 8
    text = jax.random.randint(RNG, (B, 7), 1, 19)
    text_len = jnp.full((B,), 7, jnp.int32)
    feat = jax.random.normal(RNG, (B, 8000, 1)) * 0.1
    feat_len = jnp.full((B,), 8000, jnp.int32)
    variables = net.init({"params": RNG, "dropout": RNG}, text, text_len,
                         feat, feat_len, train=False)
    tx = build_optimizer(optim_conf={"lr": 1e-3}, warmup_steps=10)
    state = init_train_state(variables, tx)
    mesh = make_mesh(n_data=8)
    step = train_step_under_mesh(make_artts_step(net, cfg, tx), mesh,
                                 donate_state=False)
    batch = dict(text=text, text_len=text_len, feat=feat, feat_len=feat_len)
    state, m = step(state, batch, RNG)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_fastspeech2_step_runs():
    cfg = FastSpeech2Config(
        vocab_size=20,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01, return_energy=True),
        feat_norm=FeatNormConfig(feat_dim=20),
        pitch_norm=FeatNormConfig(feat_dim=1),
        energy_norm=FeatNormConfig(feat_dim=1),
        enc_emb=dict(embedding_dim=D), enc_prenet=None,
        encoder=dict(d_model=D, num_heads=4, num_layers=1, fdfwd_dim=64),
        duration_predictor=dict(conv_dims=[D]),
        pitch_predictor=dict(conv_dims=[D]),
        energy_predictor=dict(conv_dims=[D]),
        decoder=dict(d_model=D, num_heads=4, num_layers=1, fdfwd_dim=64),
        postnet=dict(conv_dims=[D], conv_kernel=5))
    net = FastSpeech2Net(cfg=cfg)
    B, L = 8, 5
    text = jax.random.randint(RNG, (B, L), 1, 19)
    text_len = jnp.full((B,), L, jnp.int32)
    feat = jax.random.normal(RNG, (B, 8000, 1)) * 0.1
    feat_len = jnp.full((B,), 8000, jnp.int32)
    pitch = jnp.abs(jax.random.normal(RNG, (B, 101))) * 100
    pitch_len = jnp.full((B,), 101, jnp.int32)
    dur = jnp.full((B, L), 20.0)
    variables = net.init({"params": RNG, "dropout": RNG}, text, text_len,
                         feat, feat_len, pitch, pitch_len, dur, text_len,
                         train=False)
    tx = build_optimizer(optim_conf={"lr": 1e-3}, warmup_steps=10)
    state = init_train_state(variables, tx)
    mesh = make_mesh(n_data=8)
    step = train_step_under_mesh(make_fastspeech2_step(net, cfg, tx), mesh,
                                 donate_state=False)
    batch = dict(text=text, text_len=text_len, feat=feat, feat_len=feat_len,
                 pitch=pitch, pitch_len=pitch_len, duration=dur,
                 duration_len=text_len)
    state, m = step(state, batch, RNG)
    for k in ("feat_loss_before", "pitch_loss", "duration_loss", "loss"):
        assert np.isfinite(float(m[k])), k


def test_multi_domain_asr_step():
    cfg = ARASRConfig(
        vocab_size=20,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=20), specaug=None,
        enc_prenet=dict(conv_dims=[16], lnr_dims=D),
        encoder=dict(d_model=D, num_heads=4, num_layers=1, fdfwd_dim=64),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=1, fdfwd_dim=64))
    net = ARASRNet(cfg=cfg)

    def mk_batch(seed):
        k = jax.random.PRNGKey(seed)
        return dict(feat=jax.random.normal(k, (8, 8000, 1)) * 0.1,
                    feat_len=jnp.full((8,), 8000, jnp.int32),
                    text=jax.random.randint(k, (8, 6), 1, 19),
                    text_len=jnp.full((8,), 6, jnp.int32))

    b = mk_batch(0)
    variables = net.init({"params": RNG, "dropout": RNG, "specaug": RNG},
                         b["feat"], b["feat_len"], b["text"], b["text_len"],
                         train=False)
    tx = build_optimizer(optim_conf={"lr": 1e-3}, warmup_steps=10)
    state = init_train_state(variables, tx)
    mesh = make_mesh(n_data=8)
    step = train_step_under_mesh(
        make_multi_domain_arasr_step(
            net, cfg, tx, loss_weights=dict(real=1.0, syn=0.5)),
        mesh, donate_state=False)
    batches = dict(real=mk_batch(1), syn=mk_batch(2))
    state, m = step(state, batches, RNG)
    assert np.isfinite(float(m["loss"]))
    assert "real_ce_loss" in m and "syn_ce_loss" in m
    assert int(state.step) == 1
