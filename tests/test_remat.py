"""Backward-pass rematerialization (`remat` knob on the layer stacks).

`nn.remat` must be a pure memory/FLOPs trade: loss, gradients, and the
mutated collections (conformer BatchNorm batch_stats) have to match the
non-remat path bit-for-bit (same rng threading, same math). These tests
pin that, including the modes that must opt OUT (attmat requests, cached
decode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(7)
D = 32


def _arasr(remat: bool):
    from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
    from speechain_tpu.ops.feat_norm import FeatNormConfig
    from speechain_tpu.ops.frontend import FrontendConfig

    cfg = ARASRConfig(
        vocab_size=20,
        frontend=FrontendConfig(n_mels=20, sr=8000, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=20),
        enc_prenet=dict(conv_dims=[D], conv_kernel=3, conv_stride=2,
                        lnr_dims=D),
        encoder_type="conformer",
        encoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64,
                     remat=remat),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=2, fdfwd_dim=64,
                     remat=remat),
        ctc_weight=0.3)
    return ARASRNet(cfg=cfg), cfg


def _arasr_batch():
    k1, k2 = jax.random.split(RNG)
    B = 4
    feat = jax.random.normal(k1, (B, 4000, 1)) * 0.1
    feat_len = jnp.full((B,), 4000, jnp.int32)
    text = jax.random.randint(k2, (B, 6), 1, 19)
    text_len = jnp.full((B,), 6, jnp.int32)
    return feat, feat_len, text, text_len


def _loss_and_grads(net, cfg, variables):
    from speechain_tpu.models.ar_asr import arasr_loss

    feat, feat_len, text, text_len = _arasr_batch()

    def loss_fn(params):
        outputs, new_mut = net.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            feat, feat_len, text, text_len, train=True, axis_name=None,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "specaug": jax.random.PRNGKey(2)},
            mutable=["norm_stats", "batch_stats"])
        loss, _ = arasr_loss(outputs, text, text_len, cfg)
        return loss, new_mut

    (loss, new_mut), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    return loss, grads, new_mut


def test_arasr_remat_matches_plain():
    net0, cfg0 = _arasr(remat=False)
    net1, cfg1 = _arasr(remat=True)
    feat, feat_len, text, text_len = _arasr_batch()
    variables = net0.init({"params": RNG, "dropout": RNG, "specaug": RNG},
                          feat, feat_len, text, text_len, train=False)

    loss0, grads0, mut0 = _loss_and_grads(net0, cfg0, variables)
    loss1, grads1, mut1 = _loss_and_grads(net1, cfg1, variables)

    assert np.allclose(np.asarray(loss0), np.asarray(loss1), atol=1e-6)
    for (p0, g0), (p1, g1) in zip(
            jax.tree_util.tree_leaves_with_path(grads0),
            jax.tree_util.tree_leaves_with_path(grads1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   atol=1e-5, err_msg=str(p0))
    # mutated collections (BatchNorm batch_stats, running feat-norm)
    for (p0, v0), (p1, v1) in zip(
            jax.tree_util.tree_leaves_with_path(mut0),
            jax.tree_util.tree_leaves_with_path(mut1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                   atol=1e-6, err_msg=str(p0))


def test_lm_remat_matches_plain_and_decodes():
    from speechain_tpu.nn.lm import LanguageModelNet, LMConfig

    def build(remat):
        cfg = LMConfig(vocab_size=20, emb=dict(embedding_dim=D),
                       encoder=dict(d_model=D, num_heads=4, num_layers=2,
                                    fdfwd_dim=64, remat=remat))
        return LanguageModelNet(cfg=cfg)

    net0, net1 = build(False), build(True)
    B, L = 4, 10
    text = jax.random.randint(RNG, (B, L), 1, 19)
    text_len = jnp.full((B,), L, jnp.int32)
    variables = net0.init({"params": RNG, "dropout": RNG}, text, text_len)

    def loss(net, params):
        logits = net.apply({"params": params}, text, text_len, train=True,
                           rngs={"dropout": jax.random.PRNGKey(3)})[0]
        oh = jax.nn.one_hot(text, 20)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    l0, g0 = jax.value_and_grad(lambda p: loss(net0, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(net1, p))(variables["params"])
    assert np.allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # remat must not disturb the cached decode path (it opts out there):
    # priming + one decode step still run with the remat-enabled module
    assert net1.cfg.encoder.get("remat") is True
    prime_vars = net1.apply(variables, text[:, :1], prime=True,
                            cache_capacity=L, mutable=["cache"],
                            method="decode_step")[1]
    out = net1.apply({**variables, **prime_vars}, text[:, :1],
                     mutable=["cache"], method="decode_step")[0]
    assert np.isfinite(np.asarray(out)).all()
