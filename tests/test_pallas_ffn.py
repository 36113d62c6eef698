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
