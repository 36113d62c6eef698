"""Unit tests for the NN core: shapes, KV-cache decode equivalence,
conformer, prenets, specaug, feature normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.nn.conformer import ConformerEncoder
from speechain_tpu.nn.prenets import (
    Conv1dPrenet,
    Conv2dPrenet,
    EmbedPrenet,
    LinearPrenet,
)
from speechain_tpu.nn.transformer import TransformerDecoder, TransformerEncoder
from speechain_tpu.ops.feat_norm import (
    FeatNormConfig,
    apply_feat_norm,
    init_stats,
    recover_feat_norm,
)
from speechain_tpu.ops.specaug import SpecAugmentConfig, spec_augment
from speechain_tpu.utils.masks import make_mask_from_len

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


def test_transformer_encoder_shapes():
    B, T, D = 2, 37, 64
    enc = TransformerEncoder(d_model=D, num_heads=4, num_layers=2,
                             fdfwd_dim=128)
    x = jax.random.normal(RNG, (B, T, D))
    mask = make_mask_from_len(jnp.array([37, 30]), T)
    params = enc.init({"params": RNG}, x, mask)
    out, m, attmats, hiddens = enc.apply(
        params, x, mask, return_attmat=True, return_hidden=True)
    assert out.shape == (B, T, D)
    assert len(attmats) == 2 and attmats[0].shape == (B, 4, T, T)
    assert len(hiddens) == 2


def test_transformer_encoder_unidirectional_is_causal():
    """uni_direction must make outputs independent of future frames."""
    B, T, D = 1, 10, 32
    enc = TransformerEncoder(d_model=D, num_heads=4, num_layers=2,
                             fdfwd_dim=64, uni_direction=True)
    x = jax.random.normal(RNG, (B, T, D))
    params = enc.init({"params": RNG}, x, None)
    out1, *_ = enc.apply(params, x, None)
    x2 = x.at[:, 5:].set(jax.random.normal(jax.random.PRNGKey(9), (B, 5, D)))
    out2, *_ = enc.apply(params, x2, None)
    np.testing.assert_allclose(np.asarray(out1[:, :5]),
                               np.asarray(out2[:, :5]), atol=1e-5)


def test_decoder_kv_cache_matches_full_forward():
    """The KV-cached step decoder must reproduce the full (teacher-forced)
    forward on valid positions — the core guarantee for beam search."""
    B, T, D, L = 2, 23, 64, 11
    enc = TransformerEncoder(d_model=D, num_heads=4, num_layers=2,
                             fdfwd_dim=128)
    x = jax.random.normal(RNG, (B, T, D))
    mask = make_mask_from_len(jnp.array([23, 17]), T)
    eparams = enc.init({"params": RNG}, x, mask)
    enc_out, *_ = enc.apply(eparams, x, mask)

    dec = TransformerDecoder(d_model=D, num_heads=4, num_layers=2,
                             fdfwd_dim=128)
    tgt = jax.random.normal(RNG, (B, L, D))
    tlen = np.array([11, 8])
    tmask = make_mask_from_len(jnp.array(tlen), L)
    dvars = dec.init({"params": RNG}, tgt, enc_out, tmask, mask)
    full, *_ = dec.apply(dvars, tgt, enc_out, tmask, mask)

    _, cv = dec.apply(dvars, tgt[:, :1], enc_out, None, mask, decode=True,
                      prime=True, cache_capacity=16, mutable=["cache"])
    cache = cv["cache"]
    steps = []
    for t in range(L):
        o, cu = dec.apply({**dvars, "cache": cache}, tgt[:, t:t + 1],
                          enc_out, None, mask, decode=True,
                          mutable=["cache"])
        cache = cu["cache"]
        steps.append(o[0])
    stepped = np.asarray(jnp.concatenate(steps, axis=1))
    full = np.asarray(full)
    for i in range(B):
        np.testing.assert_allclose(stepped[i, :tlen[i]], full[i, :tlen[i]],
                                   atol=1e-5)


def test_conformer_shapes():
    B, T, D = 2, 29, 64
    conf = ConformerEncoder(d_model=D, num_heads=4, num_layers=2,
                            fdfwd_dim=128)
    x = jax.random.normal(RNG, (B, T, D))
    mask = make_mask_from_len(jnp.array([29, 20]), T)
    cvars = conf.init({"params": RNG}, x, mask)
    out, *_ = conf.apply(cvars, x, mask)
    assert out.shape == (B, T, D)


def test_conformer_unidirectional_is_causal():
    """uni_direction=True must make the conformer causal end to end:
    subsequent-masked rel-pos attention AND a left-padded conv module —
    eval outputs at frame t are independent of frames > t. The default
    (bidirectional) conformer must NOT pass the same lesion."""
    B, T, D = 1, 12, 32
    x = jax.random.normal(RNG, (B, T, D))
    x2 = x.at[:, 6:].set(
        jax.random.normal(jax.random.PRNGKey(9), (B, 6, D)))

    conf = ConformerEncoder(d_model=D, num_heads=4, num_layers=2,
                            fdfwd_dim=64, depthwise_kernel_size=5,
                            uni_direction=True)
    cvars = conf.init({"params": RNG}, x, None)
    out1, *_ = conf.apply(cvars, x, None, mutable=["batch_stats"])[0]
    out2, *_ = conf.apply(cvars, x2, None, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(out1[:, :6]),
                               np.asarray(out2[:, :6]), atol=1e-5)

    bi = ConformerEncoder(d_model=D, num_heads=4, num_layers=2,
                          fdfwd_dim=64, depthwise_kernel_size=5)
    bvars = bi.init({"params": RNG}, x, None)
    b1, *_ = bi.apply(bvars, x, None, mutable=["batch_stats"])[0]
    b2, *_ = bi.apply(bvars, x2, None, mutable=["batch_stats"])[0]
    assert np.abs(np.asarray(b1[:, :6] - b2[:, :6])).max() > 1e-3


def test_conformer_causal_grads_flow():
    """A train-mode pass of the causal conformer must produce finite
    gradients for every parameter (the streaming serving path trains
    with uni_direction=true)."""
    B, T, D = 2, 16, 32
    conf = ConformerEncoder(d_model=D, num_heads=4, num_layers=2,
                            fdfwd_dim=64, depthwise_kernel_size=5,
                            uni_direction=True, res_dropout=0.0,
                            att_dropout=0.0, fdfwd_dropout=0.0,
                            posenc_dropout=0.0)
    x = jax.random.normal(RNG, (B, T, D))
    cvars = conf.init({"params": RNG}, x, None)

    def loss(params):
        out, *_ = conf.apply({**cvars, "params": params}, x, None,
                             train=True, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(cvars["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
    assert nonzero >= len(leaves) - 2     # (biases may be zero-grad)


def test_conv2d_prenet_downsamples_4x():
    B, T, F = 2, 53, 80
    pre = Conv2dPrenet(conv_dims=[64, 64], lnr_dims=256)
    feat = jax.random.normal(RNG, (B, T, F))
    flen = jnp.array([53, 40])
    pvars = pre.init({"params": RNG}, feat, flen)
    out, olen = pre.apply(pvars, feat, flen)
    # len = (len - 3)//2 + 1 applied twice (conv2d.py:244-252)
    want = [(53 - 3) // 2 + 1, (40 - 3) // 2 + 1]
    want = [(w - 3) // 2 + 1 for w in want]
    assert list(np.asarray(olen)) == want
    t_out = (((53 - 3) // 2 + 1) - 3) // 2 + 1
    assert out.shape == (B, t_out, 256)


def test_conv1d_prenet_and_linear_prenet():
    B, T, D = 2, 19, 32
    pre = Conv1dPrenet(conv_dims=[48, 48], conv_kernel=5, lnr_dims=-1)
    x = jax.random.normal(RNG, (B, T, D))
    pvars = pre.init({"params": RNG}, x)
    out, _ = pre.apply(pvars, x, mutable=["batch_stats"])[0]
    assert out.shape == (B, T, 48)

    lin = LinearPrenet(lnr_dims=[64, 16])
    lvars = lin.init({"params": RNG}, x)
    lout, _ = lin.apply(lvars, x)
    assert lout.shape == (B, T, 16)


def test_embed_prenet_padding_and_scale():
    emb = EmbedPrenet(vocab_size=10, embedding_dim=8, scale=True)
    text = jnp.array([[1, 2, 0], [3, 0, 0]])
    v = emb.init(RNG, text)
    out = emb.apply(v, text)
    assert out.shape == (2, 3, 8)
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.zeros(8))


def test_specaug_masks_and_preserves_shape():
    B, T, D = 3, 60, 80
    feat = jax.random.normal(RNG, (B, T, D)) + 5.0
    flen = jnp.array([60, 55, 50])
    out = spec_augment(RNG, feat, flen, SpecAugmentConfig())
    assert out.shape == feat.shape
    frac = float((out == 0.0).mean())
    assert 0.0 < frac < 0.9  # something masked, not everything


def test_specaug_no_warp_when_short():
    cfg = SpecAugmentConfig(time_warp=True, freq_mask=False, time_mask=False)
    B, T, D = 2, 9, 12
    feat = jax.random.normal(RNG, (B, T, D))
    flen = jnp.array([9, 9])
    out = spec_augment(RNG, feat, flen, cfg)  # min_len <= 2*5+1 -> no-op
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat))


def test_feat_norm_global_update_and_recover():
    cfg = FeatNormConfig(feat_dim=12)
    stats = init_stats(cfg)
    feat = jax.random.normal(RNG, (4, 20, 12)) * 3.0 + 1.5
    flen = jnp.array([20, 18, 15, 20])
    out, _, st = apply_feat_norm(stats, feat, flen, cfg, train=True,
                                 epoch=jnp.asarray(1))
    assert st.seen[0]
    # normalized output should be roughly zero-mean unit-std
    assert abs(float(out.mean())) < 0.5
    rec = recover_feat_norm(st, out, cfg)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(feat), atol=1e-4)


def test_feat_norm_stops_updating_after_max_epoch():
    cfg = FeatNormConfig(feat_dim=6, max_epoch_num=2)
    stats = init_stats(cfg)
    feat = jax.random.normal(RNG, (2, 10, 6))
    flen = jnp.array([10, 10])
    _, _, st1 = apply_feat_norm(stats, feat, flen, cfg, train=True,
                                epoch=jnp.asarray(1))
    _, _, st2 = apply_feat_norm(st1, feat * 100, flen, cfg, train=True,
                                epoch=jnp.asarray(5))
    np.testing.assert_allclose(np.asarray(st1.mean), np.asarray(st2.mean))


def test_feat_norm_utterance():
    cfg = FeatNormConfig(norm_type="utterance", feat_dim=6)
    feat = jax.random.normal(RNG, (2, 30, 6)) * 2 + 7
    flen = jnp.array([30, 25])
    out, _, _ = apply_feat_norm(None, feat, flen, cfg, train=True)
    v = np.asarray(out[0, :30])
    assert abs(v.mean()) < 1e-5 and abs(v.std() - 1.0) < 0.05


def test_feat_norm_group_fallback_to_average():
    cfg = FeatNormConfig(norm_type="group", num_groups=4, feat_dim=6)
    stats = init_stats(cfg)
    feat = jax.random.normal(RNG, (4, 10, 6)) + 2.0
    flen = jnp.array([10, 10, 10, 10])
    gid = jnp.array([0, 0, 1, 1])
    _, _, st = apply_feat_norm(stats, feat, flen, cfg, train=True,
                               epoch=jnp.asarray(1), group_ids=gid)
    assert bool(st.seen[0]) and bool(st.seen[1]) and not bool(st.seen[2])
    # unseen group normalizes with the average stats (no NaNs)
    out, _, _ = apply_feat_norm(st, feat, flen, cfg, train=False,
                                group_ids=jnp.array([3, 3, 3, 3]))
    assert np.isfinite(np.asarray(out)).all()


def test_conv1dev_padding_modes():
    from speechain_tpu.nn.prenets import Conv1dEv

    x = jax.random.normal(RNG, (1, 10, 4))
    for mode, want_len in [("same", 10), ("valid", 8), ("full", 12),
                           ("causal", 10)]:
        conv = Conv1dEv(out_channels=6, kernel_size=3, padding_mode=mode)
        v = conv.init(RNG, x)
        out = conv.apply(v, x)
        assert out.shape == (1, want_len, 6), (mode, out.shape)

    # causal: output at t must not depend on inputs after t
    conv = Conv1dEv(out_channels=2, kernel_size=3, padding_mode="causal")
    v = conv.init(RNG, x)
    o1 = conv.apply(v, x)
    x2 = x.at[:, 6:].set(0.0)
    o2 = conv.apply(v, x2)
    np.testing.assert_allclose(np.asarray(o1[:, :6]), np.asarray(o2[:, :6]),
                               atol=1e-6)

    # even kernel 'same' keeps length
    conv = Conv1dEv(out_channels=2, kernel_size=4, padding_mode="same")
    v = conv.init(RNG, x)
    assert conv.apply(v, x).shape[1] == 10
