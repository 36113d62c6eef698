"""Fused FFN kernel (ops/pallas_ffn.py) vs the nn.Dense path: forward,
custom-VJP gradients, dropout contract, and module param-tree identity.
Interpret mode on CPU (forced via SPEECHAIN_FORCE_FUSED_FFN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)
SEED = jnp.zeros((1,), jnp.int32)


def _inputs(N=32, D=128, F=256):
    ks = jax.random.split(RNG, 6)
    x = jax.random.normal(ks[0], (N, D))
    k1 = jax.random.normal(ks[1], (D, F)) * 0.05
    b1 = jax.random.normal(ks[2], (F,)) * 0.1
    k2 = jax.random.normal(ks[3], (F, D)) * 0.05
    b2 = jax.random.normal(ks[4], (D,)) * 0.1
    g = jax.random.normal(ks[5], (N, D))
    return x, k1, b1, k2, b2, g


def _ref(x, k1, b1, k2, b2, act="GELU"):
    from speechain_tpu.nn.feed_forward import get_activation
    return get_activation(act)(x @ k1 + b1) @ k2 + b2


def test_fused_ffn_forward_and_grads():
    from speechain_tpu.ops.pallas_ffn import fused_ffn

    x, k1, b1, k2, b2, g = _inputs()

    out = fused_ffn(x, k1, b1, k2, b2, SEED, "GELU", 0.0)
    ref = _ref(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def lf(*args):
        return jnp.sum(fused_ffn(*args, SEED, "GELU", 0.0) * g)

    def lr(*args):
        return jnp.sum(_ref(*args) * g)

    gf = jax.grad(lf, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    for name, a, b in zip("x,k1,b1,k2,b2".split(","), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_fused_ffn_dropout_contract():
    from speechain_tpu.ops.pallas_ffn import fused_ffn

    x, k1, b1, k2, b2, g = _inputs()
    s1 = jnp.asarray([3], jnp.int32)
    a = fused_ffn(x, k1, b1, k2, b2, s1, "GELU", 0.5)
    b = fused_ffn(x, k1, b1, k2, b2, s1, "GELU", 0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fused_ffn(x, k1, b1, k2, b2, s1 + 1, "GELU", 0.5)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6

    # fwd/bwd use the same mask: directional derivative == finite diff
    dv = jax.random.normal(jax.random.fold_in(RNG, 5), x.shape)

    def f(xx):
        return jnp.sum(fused_ffn(xx, k1, b1, k2, b2, s1, "GELU", 0.5) * g)

    an = float(jnp.sum(jax.grad(f)(x) * dv))
    eps = 1e-3
    fd = float((f(x + eps * dv) - f(x - eps * dv)) / (2 * eps))
    assert abs(an - fd) < 1e-2 * max(1.0, abs(fd)), (an, fd)


def test_ffn_module_fused_matches_dense(monkeypatch):
    from speechain_tpu.nn.feed_forward import PositionwiseFeedForward

    x = jax.random.normal(RNG, (2, 16, 128))
    ffn = PositionwiseFeedForward(d_model=128, fdfwd_dim=256,
                                  fdfwd_activation="GELU", dropout=0.0)
    monkeypatch.delenv("SPEECHAIN_FORCE_FUSED_FFN", raising=False)
    v_dense = ffn.init({"params": RNG}, x)
    ref = ffn.apply(v_dense, x)
    monkeypatch.setenv("SPEECHAIN_FORCE_FUSED_FFN", "1")
    v_fused = ffn.init({"params": RNG}, x)
    assert (jax.tree_util.tree_structure(v_dense) ==
            jax.tree_util.tree_structure(v_fused))
    out = ffn.apply(v_dense, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_ffn_residual_forward_and_grads():
    from speechain_tpu.ops.pallas_ffn import fused_ffn_residual

    x, k1, b1, k2, b2, g = _inputs()
    res = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    out = fused_ffn_residual(x, res, k1, b1, k2, b2, SEED, SEED,
                             "GELU", 0.0, 0.0, 0.5)
    ref = res + 0.5 * _ref(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def lf(x, res, *args):
        return jnp.sum(fused_ffn_residual(x, res, *args, SEED, SEED,
                                          "GELU", 0.0, 0.0, 0.5) * g)

    def lr(x, res, *args):
        return jnp.sum((res + 0.5 * _ref(x, *args)) * g)

    gf = jax.grad(lf, argnums=tuple(range(6)))(x, res, k1, b1, k2, b2)
    gr = jax.grad(lr, argnums=tuple(range(6)))(x, res, k1, b1, k2, b2)
    for name, a, b in zip("x,res,k1,b1,k2,b2".split(","), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4, err_msg=name)
    # dres must be an exact pass-through of the output cotangent
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(g),
                               atol=0, rtol=0)


def test_fused_ffn_residual_dropout_contract():
    from speechain_tpu.ops.pallas_ffn import fused_ffn_residual

    x, k1, b1, k2, b2, g = _inputs()
    res = jax.random.normal(jax.random.PRNGKey(9), x.shape)
    s1, s2 = jnp.asarray([3], jnp.int32), jnp.asarray([11], jnp.int32)
    a = fused_ffn_residual(x, res, k1, b1, k2, b2, s1, s2,
                           "GELU", 0.0, 0.5, 1.0)
    b = fused_ffn_residual(x, res, k1, b1, k2, b2, s1, s2,
                           "GELU", 0.0, 0.5, 1.0)
    # reproducible from the seed
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    c = fused_ffn_residual(x, res, k1, b1, k2, b2, s1,
                           jnp.asarray([12], jnp.int32),
                           "GELU", 0.0, 0.5, 1.0)
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # dropped positions revert to the residual value; kept are scaled 2x
    ffn_part = np.asarray(a) - np.asarray(res)
    ref_part = np.asarray(_ref(x, k1, b1, k2, b2))
    kept = np.abs(ffn_part) > 1e-7
    frac = kept.mean()
    assert 0.3 < frac < 0.7, frac
    np.testing.assert_allclose(ffn_part[kept], 2.0 * ref_part[kept],
                               rtol=1e-4, atol=1e-5)


def test_layer_residual_module_parity(monkeypatch):
    """Whole encoder layer: fused-forced vs XLA path, train=False."""
    from speechain_tpu.nn.transformer import TransformerEncoderLayer

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 128))
    mod = TransformerEncoderLayer(d_model=128, num_heads=4,
                                  fdfwd_dim=256, dtype=jnp.float32)
    vs = mod.init({"params": jax.random.PRNGKey(1)}, x, None, train=False)

    monkeypatch.setenv("SPEECHAIN_FORCE_FUSED_FFN", "1")
    out_f, _ = mod.apply(vs, x, None, train=False)
    monkeypatch.delenv("SPEECHAIN_FORCE_FUSED_FFN")
    monkeypatch.setenv("SPEECHAIN_DISABLE_FUSED_FFN", "1")
    out_x, _ = mod.apply(vs, x, None, train=False)
    monkeypatch.delenv("SPEECHAIN_DISABLE_FUSED_FFN")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-5, rtol=2e-5)
