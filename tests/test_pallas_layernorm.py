"""Fused LayerNorm kernel (ops/pallas_layernorm.py) vs flax.linen.LayerNorm:
forward and custom-VJP gradients, plus the drop-in module's param-tree
compatibility. Interpret mode on CPU."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


@pytest.mark.parametrize("shape", [(4, 16, 128), (8, 256), (2, 24, 256)])
def test_fused_ln_matches_flax(shape):
    from speechain_tpu.ops.pallas_layernorm import fused_layer_norm

    D = shape[-1]
    ks = jax.random.split(RNG, 4)
    x = jax.random.normal(ks[0], shape) * 3 + 1
    scale = jax.random.normal(ks[1], (D,)) * 0.5 + 1
    bias = jax.random.normal(ks[2], (D,)) * 0.1
    g = jax.random.normal(ks[3], shape)

    ref_mod = nn.LayerNorm(epsilon=1e-6)
    ref_vars = {"params": {"scale": scale, "bias": bias}}

    def loss_f(xx, ss, bb):
        return jnp.sum(fused_layer_norm(xx, ss, bb, 1e-6) * g)

    def loss_r(xx, ss, bb):
        return jnp.sum(ref_mod.apply(
            {"params": {"scale": ss, "bias": bb}}, xx) * g)

    out = fused_layer_norm(x, scale, bias, 1e-6)
    ref = ref_mod.apply(ref_vars, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for name, a, b in zip("x,scale,bias".split(","), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_norms_module_param_tree_and_fallback(monkeypatch):
    from speechain_tpu.nn.norms import LayerNorm

    x = jax.random.normal(RNG, (4, 10, 256), jnp.bfloat16)
    mod = LayerNorm(epsilon=1e-6, name="ln")
    flax_mod = nn.LayerNorm(epsilon=1e-6, name="ln")
    v = mod.init(RNG, x)
    vf = flax_mod.init(RNG, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)

    # XLA fallback (CPU default) matches flax
    out = mod.apply(v, x)
    ref = flax_mod.apply(vf, x)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)

    # forced-fused (interpret) path matches too
    monkeypatch.setenv("SPEECHAIN_FORCE_FUSED_LN", "1")
    out2 = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
