"""Fused conv2d-prenet cores vs the unfused flax path.

Parametrized over BOTH cores — 'xla' (the default: analytic BN1 folded
into the conv1 weights, plain autodiff backward) and 'pallas' (the
opt-in kernel, interpret mode on CPU). Checks, at fp32 on small shapes:
forward values, ALL parameter gradients (conv kernels, both BatchNorm
scale/bias — the BN1 grads exercise the analytic-batch-stats autodiff
path), BN1 running-stat updates, eval mode, and (xla core only) the
input gradient against the unfused path. Reference semantics:
prenet/conv2d.py:15-280.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.nn.prenets import Conv2dPrenet

B, T, F, C = 3, 37, 21, 128

IMPLS = ("xla", "pallas")


def _build(impl):
    """impl: 'xla' | 'pallas' | None (unfused). Returns (net, env)."""
    env = {}
    if impl is None:
        env["SPEECHAIN_DISABLE_FUSED_PRENET"] = "1"
    elif impl == "pallas":
        env["SPEECHAIN_FORCE_FUSED_PRENET"] = "pallas"
    else:
        env["SPEECHAIN_FORCE_FUSED_PRENET"] = "xla"
    return Conv2dPrenet(conv_dims=[C, C], conv_kernel=3, conv_stride=2,
                        conv_padding=0, conv_batchnorm=True,
                        conv_activation="LeakyReLU", lnr_dims=C,
                        dtype=jnp.float32, bn_axis_name=None), env


class _env:
    def __init__(self, env):
        self.env = env

    def __enter__(self):
        keys = {"SPEECHAIN_DISABLE_FUSED_PRENET",
                "SPEECHAIN_FORCE_FUSED_PRENET"} | set(self.env)
        self.old = {k: os.environ.get(k) for k in keys}
        for k in self.old:
            os.environ.pop(k, None)
        os.environ.update(self.env)

    def __exit__(self, *a):
        for k, v in self.old.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v


@pytest.fixture(scope="module")
def data():
    rng = jax.random.PRNGKey(0)
    feat = jax.random.normal(rng, (B, T, F), jnp.float32)
    flen = jnp.full((B,), T, jnp.int32)
    net, env = _build("xla")
    with _env(env):
        variables = net.init({"params": rng}, feat, flen, train=False)
    return feat, flen, variables


def _run(impl, variables, feat, flen, train):
    net, env = _build(impl)
    with _env(env):
        out, mut = net.apply(variables, feat, flen, train=train,
                             mutable=["batch_stats"])
    return out, mut


@pytest.mark.parametrize("impl", IMPLS)
def test_param_trees_match(data, impl):
    feat, flen, variables = data
    net, env = _build(None)
    with _env(env):
        v2 = net.init({"params": jax.random.PRNGKey(0)}, feat, flen,
                      train=False)
    net_i, env_i = _build(impl)
    with _env(env_i):
        v3 = net_i.init({"params": jax.random.PRNGKey(0)}, feat, flen,
                        train=False)
    for other in (v2, v3):
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(other))
        s1 = jax.tree_util.tree_map(lambda x: x.shape, variables)
        s2 = jax.tree_util.tree_map(lambda x: x.shape, other)
        assert s1 == s2


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("train", [False, True])
def test_forward_equivalence(data, impl, train):
    feat, flen, variables = data
    (o1, l1), m1 = _run(impl, variables, feat, flen, train)
    (o2, l2), m2 = _run(None, variables, feat, flen, train)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-4, atol=2e-4)
    if train:
        for k in ("batchnorm_0", "batchnorm_1"):
            for s in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(m1["batch_stats"][k][s]),
                    np.asarray(m2["batch_stats"][k][s]),
                    rtol=2e-4, atol=2e-4, err_msg=f"{k}/{s}")


def _loss_fn(params, impl, variables, feat, flen):
    net, env = _build(impl)
    with _env(env):
        (out, _), _ = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feat, flen, train=True, mutable=["batch_stats"])
    w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32) * 0.37)
    return jnp.sum(out.reshape(-1) * w)


@pytest.mark.parametrize("impl", IMPLS)
def test_grad_equivalence(data, impl):
    feat, flen, variables = data
    g1 = jax.grad(
        lambda p: _loss_fn(p, impl, variables, feat, flen))(
        variables["params"])
    g2 = jax.grad(
        lambda p: _loss_fn(p, None, variables, feat, flen))(
        variables["params"])
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, v1 in flat1:
        ks = jax.tree_util.keystr(k)
        v2 = flat2[ks]
        scale = max(float(jnp.max(jnp.abs(v2))), 1e-6)
        err = float(jnp.max(jnp.abs(v1 - v2))) / scale
        assert err < 5e-4, f"{ks}: rel err {err:.2e}"


def test_input_grad_equivalence_xla(data):
    """The XLA core propagates EXACT input gradients (including through
    the analytic BN1 stats); the pallas core documents dM = 0 and
    stop_gradients its stats, so only the xla core is held to this."""
    feat, flen, variables = data
    g1 = jax.grad(
        lambda f: _loss_fn(variables["params"], "xla", variables, f,
                           flen))(feat)
    g2 = jax.grad(
        lambda f: _loss_fn(variables["params"], None, variables, f,
                           flen))(feat)
    scale = max(float(jnp.max(jnp.abs(g2))), 1e-6)
    err = float(jnp.max(jnp.abs(g1 - g2))) / scale
    assert err < 5e-4, f"input grad rel err {err:.2e}"


def test_default_impl_is_unfused():
    """Default = unfused flax path: the XLA core measured 28.7 ms/step
    SLOWER at the bench config on v5e (BENCH_r05 A/B — the materialized
    patch matrix's 9-wide lane layout outweighs the saved stat passes);
    both fused cores stay opt-in (prenet_core_impl docstring)."""
    from speechain_tpu.ops.pallas_prenet import prenet_core_impl
    with _env({}):
        assert prenet_core_impl() is None
    with _env({"SPEECHAIN_FORCE_FUSED_PRENET": "xla"}):
        assert prenet_core_impl() == "xla"
    with _env({"SPEECHAIN_DISABLE_FUSED_PRENET": "1"}):
        assert prenet_core_impl() is None
    with _env({"SPEECHAIN_FORCE_FUSED_PRENET": "1"}):
        assert prenet_core_impl() == "pallas"
    with _env({"SPEECHAIN_FORCE_FUSED_PRENET": "1",
               "SPEECHAIN_DISABLE_PALLAS": "1"}):
        assert prenet_core_impl() == "xla"
