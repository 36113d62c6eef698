"""Fused conv-module kernel (ops/pallas_convmod.py) vs the XLA path.

Runs in interpret mode on CPU (the kernel is forced on via env); the same
assertions run compiled on a real TPU backend. Covers: forward values +
BatchNorm moments, full gradients (input + every weight, including the
statistics cotangent path), module-level parity including updated
batch_stats, non-aligned T (sublane padding), and eval mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.ops.pallas_convmod import fused_conv_glu_dw

C, K = 128, 7
P = (K - 1) // 2


def _ref_impl(x, w1, b1, dwk, dwb):
    """Plain-jnp reference: pointwise -> GLU -> depthwise 'SAME' + stats."""
    z = x @ w1 + b1
    a = z[..., :C] * jax.nn.sigmoid(z[..., C:])
    T = x.shape[1]
    ap = jnp.pad(a, ((0, 0), (P, K - 1 - P), (0, 0)))
    u = sum(ap[:, k:k + T, :] * dwk[k] for k in range(K)) + dwb
    s = jnp.sum(u, axis=(0, 1))
    ss = jnp.sum(u * u, axis=(0, 1))
    return u, s, ss


def _inputs(B=3, T=37, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (B, T, C), jnp.float32)
    w1 = jax.random.normal(ks[1], (C, 2 * C)) * 0.1
    b1 = jax.random.normal(ks[2], (2 * C,)) * 0.1
    dwk = jax.random.normal(ks[3], (K, C)) * 0.3
    dwb = jax.random.normal(ks[4], (C,)) * 0.1
    return x, w1, b1, dwk, dwb


def test_forward_matches_reference():
    args = _inputs()
    u, s, ss = fused_conv_glu_dw(*args, K)
    ur, sr, ssr = _ref_impl(*args)
    np.testing.assert_allclose(u, ur, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s, sr, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ss, ssr, rtol=1e-4, atol=1e-3)


def test_gradients_match_reference():
    args = _inputs(B=2, T=24, seed=1)

    def loss_fused(*a):
        u, s, ss = fused_conv_glu_dw(*a, K)
        # exercise all three cotangent paths with distinct weights
        return (jnp.sum(u * jnp.cos(jnp.arange(u.size).reshape(u.shape)))
                + jnp.sum(s * 0.3) + jnp.sum(ss * 0.07))

    def loss_ref(*a):
        u, s, ss = _ref_impl(*a)
        return (jnp.sum(u * jnp.cos(jnp.arange(u.size).reshape(u.shape)))
                + jnp.sum(s * 0.3) + jnp.sum(ss * 0.07))

    gf = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    # interpret mode is numerically deterministic; on a real TPU backend
    # the MXU accumulation order differs between the kernel and the XLA
    # reference (measured worst case 2.4e-4 on dw1), so allow a bit more.
    # The predicate must match ops/pallas_convmod.py::_interpret (backends
    # other than tpu/axon run interpret mode and get the tight tolerance).
    tol = 1e-3 if jax.default_backend() in ("tpu", "axon") else 2e-4
    for a, b, name in zip(gf, gr, ["dx", "dw1", "db1", "ddwk", "ddwb"]):
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol, err_msg=name)


@pytest.mark.parametrize("train", [True, False])
def test_module_parity(monkeypatch, train):
    from speechain_tpu.nn.conformer import ConvolutionModule
    B, T = 4, 21
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, C))
    mod = ConvolutionModule(channels=C, depthwise_kernel_size=K,
                            dtype=jnp.float32)
    vs = mod.init({"params": jax.random.PRNGKey(7)}, x, train=False)

    def run(force):
        if force:
            monkeypatch.setenv("SPEECHAIN_FORCE_FUSED_CONVMOD", "1")
        else:
            monkeypatch.delenv("SPEECHAIN_FORCE_FUSED_CONVMOD",
                               raising=False)
            monkeypatch.setenv("SPEECHAIN_DISABLE_FUSED_CONVMOD", "1")
        out, mut = mod.apply(vs, x, train=train, mutable=["batch_stats"])
        monkeypatch.delenv("SPEECHAIN_DISABLE_FUSED_CONVMOD", raising=False)
        return out, mut["batch_stats"]

    # both paths must see the SAME param tree (fused declares
    # nn.Conv-compatible params)
    monkeypatch.setenv("SPEECHAIN_FORCE_FUSED_CONVMOD", "1")
    vs_fused = mod.init({"params": jax.random.PRNGKey(7)}, x, train=False)
    assert jax.tree_util.tree_structure(vs_fused) == \
        jax.tree_util.tree_structure(vs)
    for a, b in zip(jax.tree_util.tree_leaves(vs_fused),
                    jax.tree_util.tree_leaves(vs)):
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg="init parity")

    out_f, bs_f = run(True)
    out_x, bs_x = run(False)
    np.testing.assert_allclose(out_f, out_x, rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bs_f),
                    jax.tree_util.tree_leaves(bs_x)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg="batch_stats")


def test_module_grads_parity(monkeypatch):
    from speechain_tpu.nn.conformer import ConvolutionModule
    B, T = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, C))
    mod = ConvolutionModule(channels=C, depthwise_kernel_size=K,
                            dtype=jnp.float32)
    vs = mod.init({"params": jax.random.PRNGKey(9)}, x, train=False)

    def loss(params, force):
        if force:
            monkeypatch.setenv("SPEECHAIN_FORCE_FUSED_CONVMOD", "1")
            monkeypatch.delenv("SPEECHAIN_DISABLE_FUSED_CONVMOD",
                               raising=False)
        else:
            monkeypatch.delenv("SPEECHAIN_FORCE_FUSED_CONVMOD",
                               raising=False)
            monkeypatch.setenv("SPEECHAIN_DISABLE_FUSED_CONVMOD", "1")
        out, _ = mod.apply({**vs, "params": params}, x, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    gf = jax.grad(lambda p: loss(p, True))(vs["params"])
    gx = jax.grad(lambda p: loss(p, False))(vs["params"])
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            leaf, flat_x[path], rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_bfloat16_smoke(monkeypatch):
    from speechain_tpu.nn.conformer import ConvolutionModule
    monkeypatch.setenv("SPEECHAIN_FORCE_FUSED_CONVMOD", "1")
    B, T = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, C), jnp.bfloat16)
    mod = ConvolutionModule(channels=C, depthwise_kernel_size=K,
                            dtype=jnp.bfloat16)
    vs = mod.init({"params": jax.random.PRNGKey(9)}, x, train=False)
    out, mut = mod.apply(vs, x, train=True, mutable=["batch_stats"])
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()
    monkeypatch.delenv("SPEECHAIN_FORCE_FUSED_CONVMOD", raising=False)
    out_x, _ = mod.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_x, np.float32),
                               rtol=0.1, atol=0.1)
