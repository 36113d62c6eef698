"""Fused attention kernels (ops/pallas_attention.py) vs the XLA reference
math: forward and custom-VJP gradients for both the standard and the
Transformer-XL relative-position variant, including masks, causal mode and
the in-kernel dropout contract. Runs in pallas interpret mode on CPU; the
same kernels compile for TPU (exercised by bench.py and the TPU runner).

The kernels work in the (B, T, D) projection layout (heads = lane slices);
the reference math here uses the classic (B, H, T, Dh) layout, so tests
pack/unpack between the two."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)
SEED = jnp.zeros((1,), jnp.int32)


def _pack(x):
    """(B, H, T, Dh) reference layout -> (B, T, D) kernel layout."""
    B, H, T, Dh = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T, H * Dh)


def _unpack(x, H):
    B, T, D = x.shape
    return jnp.transpose(x.reshape(B, T, H, D // H), (0, 2, 1, 3))


def _pack_ph(ph):
    """(H, L, Dh) -> (L, D)."""
    H, L, Dh = ph.shape
    return jnp.transpose(ph, (1, 0, 2)).reshape(L, H * Dh)


def _inputs(B=2, H=3, T=24, Dh=16, dtype=jnp.float32):
    ks = jax.random.split(RNG, 8)
    q = jax.random.normal(ks[0], (B, H, T, Dh), dtype)
    k = jax.random.normal(ks[1], (B, H, T, Dh), dtype)
    v = jax.random.normal(ks[2], (B, H, T, Dh), dtype)
    g = jax.random.normal(ks[3], (B, H, T, Dh), dtype)
    ph = jax.random.normal(ks[4], (H, 2 * T - 1, Dh), dtype)
    bu = jax.random.normal(ks[5], (H, Dh), jnp.float32) * 0.1
    bv = jax.random.normal(ks[6], (H, Dh), jnp.float32) * 0.1
    lens = jax.random.randint(ks[7], (B,), T // 2, T + 1)
    kmask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.int32)
    return q, k, v, g, ph, bu, bv, kmask


def _flash_std(q, k, v, seed, scale, causal, rate, km):
    """Call the kernel from (B, H, T, Dh) reference-layout inputs."""
    from speechain_tpu.ops.pallas_attention import flash_attention
    H = q.shape[1]
    out = flash_attention(_pack(q), _pack(k), _pack(v), seed, scale, H,
                          causal, rate, km)
    return _unpack(out, H)


def _flash_rel(q, k, v, ph, bu, bv, seed, scale, rate, km):
    from speechain_tpu.ops.pallas_attention import flash_relpos_attention
    H = q.shape[1]
    out = flash_relpos_attention(
        _pack(q), _pack(k), _pack(v), _pack_ph(ph),
        bu.reshape(1, -1), bv.reshape(1, -1), seed, scale, H, rate, km)
    return _unpack(out, H)


def _ref_std(q, k, v, scale, causal=False, kmask=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    T = q.shape[2]
    if kmask is not None:
        s = jnp.where(kmask[:, None, None, :] > 0, s,
                      jnp.finfo(jnp.float32).min)
    if causal:
        cm = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(cm, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _ref_rel(q, k, v, ph, bu, bv, scale, kmask=None):
    from speechain_tpu.nn.attention import rel_shift
    qu = q.astype(jnp.float32) + bu[None, :, None, :]
    qv = q.astype(jnp.float32) + bv[None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", qu.astype(q.dtype), k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,hkd->bhqk", qv.astype(q.dtype), ph,
                    preferred_element_type=jnp.float32)
    bd = rel_shift(bd)
    s = (ac + bd) * scale
    if kmask is not None:
        s = jnp.where(kmask[:, None, None, :] > 0, s,
                      jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("causal,masked", [(False, False), (False, True),
                                           (True, False), (True, True)])
def test_flash_attention_forward(causal, masked):
    q, k, v, _, _, _, _, kmask = _inputs()
    scale = 1.0 / np.sqrt(q.shape[-1])
    km = kmask if masked else None
    out = _flash_std(q, k, v, SEED, scale, causal, 0.0, km)
    ref = _ref_std(q, k, v, scale, causal, km)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_grads(causal):
    q, k, v, g, _, _, _, kmask = _inputs()
    scale = 1.0 / np.sqrt(48.0)  # reference 1/sqrt(d_model) convention

    def loss_f(qq, kk, vv):
        return jnp.sum(_flash_std(qq, kk, vv, SEED, scale, causal, 0.0,
                                  kmask) * g)

    def loss_r(qq, kk, vv):
        return jnp.sum(_ref_std(qq, kk, vv, scale, causal, kmask) * g)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_attention_rectangular(masked):
    """Cross-attention shape: Tq != Tk (decoder queries over encoder
    keys/values), key-style mask over Tk."""
    B, H, Tq, Tk, Dh = 2, 3, 10, 24, 16
    ks = jax.random.split(RNG, 5)
    q = jax.random.normal(ks[0], (B, H, Tq, Dh))
    k = jax.random.normal(ks[1], (B, H, Tk, Dh))
    v = jax.random.normal(ks[2], (B, H, Tk, Dh))
    g = jax.random.normal(ks[3], (B, H, Tq, Dh))
    lens = jax.random.randint(ks[4], (B,), Tk // 2, Tk + 1)
    km = ((jnp.arange(Tk)[None, :] < lens[:, None]).astype(jnp.int32)
          if masked else None)
    scale = 1.0 / np.sqrt(48.0)
    out = _flash_std(q, k, v, SEED, scale, False, 0.0, km)
    ref = _ref_std(q, k, v, scale, False, km)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_f(qq, kk, vv):
        return jnp.sum(_flash_std(qq, kk, vv, SEED, scale, False, 0.0,
                                  km) * g)

    def loss_r(qq, kk, vv):
        return jnp.sum(_ref_std(qq, kk, vv, scale, False, km) * g)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_relpos_forward(masked):
    q, k, v, _, ph, bu, bv, kmask = _inputs()
    scale = 1.0 / np.sqrt(48.0)
    km = kmask if masked else None
    out = _flash_rel(q, k, v, ph, bu, bv, SEED, scale, 0.0, km)
    ref = _ref_rel(q, k, v, ph, bu, bv, scale, km)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_relpos_grads():
    q, k, v, g, ph, bu, bv, kmask = _inputs()
    scale = 1.0 / np.sqrt(48.0)

    def loss_f(qq, kk, vv, pp, uu, ww):
        return jnp.sum(_flash_rel(qq, kk, vv, pp, uu, ww, SEED, scale,
                                  0.0, kmask) * g)

    def loss_r(qq, kk, vv, pp, uu, ww):
        return jnp.sum(_ref_rel(qq, kk, vv, pp, uu, ww, scale, kmask) * g)

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, ph, bu, bv)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, ph, bu, bv)
    for name, a, b in zip("qkv,ph,bu,bv".split(","), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


def test_flash_dropout_contract():
    """Dropout: deterministic per seed, ~right keep rate, and the backward
    regenerates the identical mask (directional derivative wrt v matches a
    finite difference of the forward)."""
    q, k, v, g, _, _, _, _ = _inputs(B=1, H=2, T=32, Dh=16)
    scale = 0.25
    rate = 0.5
    s1 = jnp.asarray([7], jnp.int32)

    out_a = _flash_std(q, k, v, s1, scale, False, rate, None)
    out_b = _flash_std(q, k, v, s1, scale, False, rate, None)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    out_c = _flash_std(q, k, v, s1 + 1, scale, False, rate, None)
    assert np.abs(np.asarray(out_a) - np.asarray(out_c)).max() > 1e-6

    # mean over many seeds approaches the no-dropout expectation
    ref = _ref_std(q, k, v, scale)
    outs = [np.asarray(_flash_std(q, k, v, jnp.asarray([i], jnp.int32),
                                  scale, False, rate, None))
            for i in range(24)]
    mean = np.mean(outs, axis=0)
    np.testing.assert_allclose(mean, np.asarray(ref), atol=0.35)

    # backward must use the SAME mask as forward: directional derivative
    # wrt v computed by custom VJP == finite difference of the fwd
    dv_dir = jax.random.normal(jax.random.fold_in(RNG, 99), v.shape)

    def f(vv):
        return jnp.sum(_flash_std(q, k, vv, s1, scale, False, rate,
                                  None) * g)

    grad_v = jax.grad(f)(v)
    analytic = float(jnp.sum(grad_v * dv_dir))
    eps = 1e-3
    fd = float((f(v + eps * dv_dir) - f(v - eps * dv_dir)) / (2 * eps))
    assert abs(analytic - fd) < 1e-2 * max(1.0, abs(fd)), (analytic, fd)


def test_flash_bf16_close():
    q, k, v, _, _, _, _, kmask = _inputs(dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(48.0)
    out = _flash_std(q, k, v, SEED, scale, False, 0.0, kmask)
    ref = _ref_std(q, k, v, scale, False, kmask)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_mha_module_flash_matches_xla(monkeypatch):
    """MultiHeadedAttention routed through the kernel (forced on CPU) must
    match its own XLA path, including the causal LM flag."""
    from speechain_tpu.nn.attention import MultiHeadedAttention

    x = jax.random.normal(RNG, (2, 24, 48))
    lens = jnp.asarray([24, 13])
    mask = (jnp.arange(24)[None, :] < lens[:, None])[:, None, :]
    att = MultiHeadedAttention(d_model=48, num_heads=3, dropout=0.0)
    variables = att.init({"params": RNG}, x, x, x, mask)

    for causal in (False, True):
        monkeypatch.delenv("SPEECHAIN_FORCE_FLASH_ATT", raising=False)
        ref, attmat = att.apply(variables, x, x, x, mask, causal=causal,
                                return_attmat=True)
        monkeypatch.setenv("SPEECHAIN_FORCE_FLASH_ATT", "1")
        out, none_mat = att.apply(variables, x, x, x, mask, causal=causal,
                                  return_attmat=False)
        assert none_mat is None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_mha_module_flash_cross_matches_xla(monkeypatch):
    """Cross-attention (Tq != Tk, key-style src mask) through the kernel
    must match the module's XLA path — the decoder cross-attention
    training shape."""
    from speechain_tpu.nn.attention import MultiHeadedAttention

    ks = jax.random.split(RNG, 2)
    q = jax.random.normal(ks[0], (2, 10, 48))
    kv = jax.random.normal(ks[1], (2, 24, 48))
    lens = jnp.asarray([24, 13])
    mask = (jnp.arange(24)[None, :] < lens[:, None])[:, None, :]
    att = MultiHeadedAttention(d_model=48, num_heads=3, dropout=0.0)
    variables = att.init({"params": RNG}, q, kv, kv, mask)

    monkeypatch.delenv("SPEECHAIN_FORCE_FLASH_ATT", raising=False)
    ref, _ = att.apply(variables, q, kv, kv, mask, return_attmat=True)
    monkeypatch.setenv("SPEECHAIN_FORCE_FLASH_ATT", "1")
    out, none_mat = att.apply(variables, q, kv, kv, mask,
                              return_attmat=False)
    assert none_mat is None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_transformer_decoder_flash_matches_xla(monkeypatch):
    """Full TransformerDecoder training pass (causal self-att + rectangular
    cross-att, both kernel-routed) must match the XLA path, fwd + grads."""
    from speechain_tpu.nn.transformer import TransformerDecoder

    dec = TransformerDecoder(d_model=32, num_heads=4, num_layers=2,
                             fdfwd_dim=64, att_dropout=0.0,
                             fdfwd_dropout=0.0, res_dropout=0.0,
                             posenc_dropout=0.0)
    ks = jax.random.split(RNG, 2)
    tgt = jax.random.normal(ks[0], (2, 9, 32))
    enc = jax.random.normal(ks[1], (2, 21, 32))
    tgt_mask = (jnp.arange(9)[None, :] <
                jnp.asarray([9, 6])[:, None])[:, None, :]
    src_mask = (jnp.arange(21)[None, :] <
                jnp.asarray([21, 14])[:, None])[:, None, :]
    variables = dec.init({"params": RNG}, tgt, enc, tgt_mask, src_mask)

    def loss(params, use_flash):
        if use_flash:
            monkeypatch.setenv("SPEECHAIN_FORCE_FLASH_ATT", "1")
        else:
            monkeypatch.delenv("SPEECHAIN_FORCE_FLASH_ATT", raising=False)
        out = dec.apply(
            {"params": params,
             **{k: v for k, v in variables.items() if k != "params"}},
            tgt, enc, tgt_mask, src_mask, train=False,
            return_attmat=False)[0]
        return jnp.sum(out ** 2)

    l_ref = loss(variables["params"], False)
    g_ref = jax.grad(lambda p: loss(p, False))(variables["params"])
    l_f = loss(variables["params"], True)
    g_f = jax.grad(lambda p: loss(p, True))(variables["params"])
    assert abs(float(l_ref) - float(l_f)) < 2e-3 * max(1.0, abs(float(l_ref)))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg="/".join(str(p) for p in pa))


def test_conformer_encoder_flash_matches_xla(monkeypatch):
    """Full conformer encoder fwd+grads through the fused rel-pos kernel
    must match the XLA path (dropout off)."""
    from speechain_tpu.nn.conformer import ConformerEncoder

    enc = ConformerEncoder(d_model=32, num_heads=4, num_layers=2,
                           fdfwd_dim=64, att_dropout=0.0, fdfwd_dropout=0.0,
                           res_dropout=0.0, posenc_dropout=0.0)
    x = jax.random.normal(RNG, (2, 40, 32))
    lens = jnp.asarray([40, 25])
    mask = (jnp.arange(40)[None, :] < lens[:, None])[:, None, :]
    variables = enc.init({"params": RNG}, x, mask)

    def loss(params, use_flash):
        if use_flash:
            monkeypatch.setenv("SPEECHAIN_FORCE_FLASH_ATT", "1")
        else:
            monkeypatch.delenv("SPEECHAIN_FORCE_FLASH_ATT", raising=False)
        out, _, _, _ = enc.apply(
            {"params": params,
             **{k: v for k, v in variables.items() if k != "params"}},
            x, mask, train=False)
        return jnp.sum(out ** 2)

    l_ref = loss(variables["params"], False)
    g_ref = jax.grad(lambda p: loss(p, False))(variables["params"])
    l_f = loss(variables["params"], True)
    g_f = jax.grad(lambda p: loss(p, True))(variables["params"])
    assert abs(float(l_ref) - float(l_f)) < 2e-3 * abs(float(l_ref))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg="/".join(str(p) for p in pa))
