"""Fused conv2d-prenet core vs the unfused flax path (interpret mode).

Checks, at fp32 on small shapes (CPU/interpret): forward values, ALL
parameter gradients (conv kernels, both BatchNorm scale/bias — the BN1
grads exercise the analytic-batch-stats autodiff path), BN1 running-stat
updates, and eval mode. Reference semantics: prenet/conv2d.py:15-280.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ.setdefault("SPEECHAIN_FORCE_FUSED_PRENET", "1")

from speechain_tpu.nn.prenets import Conv2dPrenet  # noqa: E402

B, T, F, C = 3, 37, 21, 128


def _build(force: bool):
    env = {}
    if not force:
        env["SPEECHAIN_DISABLE_FUSED_PRENET"] = "1"
    return Conv2dPrenet(conv_dims=[C, C], conv_kernel=3, conv_stride=2,
                        conv_padding=0, conv_batchnorm=True,
                        conv_activation="LeakyReLU", lnr_dims=C,
                        dtype=jnp.float32, bn_axis_name=None), env


@pytest.fixture(scope="module")
def data():
    rng = jax.random.PRNGKey(0)
    feat = jax.random.normal(rng, (B, T, F), jnp.float32)
    flen = jnp.full((B,), T, jnp.int32)
    net, _ = _build(force=True)
    variables = net.init({"params": rng}, feat, flen, train=False)
    return feat, flen, variables


def _run(force, variables, feat, flen, train):
    net, env = _build(force)
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        out, mut = net.apply(variables, feat, flen, train=train,
                             mutable=["batch_stats"])
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else os.environ.update(
                {k: v})
    return out, mut


def test_param_trees_match(data):
    feat, flen, variables = data
    net, env = _build(force=False)
    os.environ.update(env)
    try:
        v2 = net.init({"params": jax.random.PRNGKey(0)}, feat, flen,
                      train=False)
    finally:
        os.environ.pop("SPEECHAIN_DISABLE_FUSED_PRENET", None)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    s1 = jax.tree_util.tree_map(lambda x: x.shape, variables)
    s2 = jax.tree_util.tree_map(lambda x: x.shape, v2)
    assert s1 == s2


@pytest.mark.parametrize("train", [False, True])
def test_forward_equivalence(data, train):
    feat, flen, variables = data
    (o1, l1), m1 = _run(True, variables, feat, flen, train)
    (o2, l2), m2 = _run(False, variables, feat, flen, train)
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


def test_grad_equivalence(data):
    feat, flen, variables = data

    def loss(params, force):
        net, env = _build(force)
        old = dict(os.environ)
        os.environ.update(env)
        try:
            (out, _), _ = net.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                feat, flen, train=True, mutable=["batch_stats"])
        finally:
            if not force:
                os.environ.pop("SPEECHAIN_DISABLE_FUSED_PRENET", None)
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32) * 0.37)
        return jnp.sum(out.reshape(-1) * w)

    g1 = jax.grad(lambda p: loss(p, True))(variables["params"])
    g2 = jax.grad(lambda p: loss(p, False))(variables["params"])
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, v1 in flat1:
        ks = jax.tree_util.keystr(k)
        v2 = flat2[ks]
        scale = max(float(jnp.max(jnp.abs(v2))), 1e-6)
        err = float(jnp.max(jnp.abs(v1 - v2))) / scale
        assert err < 5e-4, f"{ks}: rel err {err:.2e}"
