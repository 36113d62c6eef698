"""GPipe-style pipeline parallelism (parallel/pipeline.py): a 4-stage
pipeline over a 'pipe' mesh axis must reproduce the sequential layer stack
exactly — forward AND gradients (ppermute's transpose is the reverse
ppermute, so jax.grad through the pipeline needs no extra code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


def _layer_stack(n_layers, D):
    from speechain_tpu.nn.transformer import TransformerEncoderLayer
    layer = TransformerEncoderLayer(d_model=D, num_heads=2, fdfwd_dim=2 * D,
                                    att_dropout=0.0, fdfwd_dropout=0.0,
                                    res_dropout=0.0)
    x0 = jnp.zeros((2, 8, D))
    params = [layer.init({"params": jax.random.fold_in(RNG, i)},
                         x0, None)["params"] for i in range(n_layers)]

    def layer_fn(p, h):
        out, _ = layer.apply({"params": p}, h, None, train=False,
                             return_attmat=False)
        return out

    return layer_fn, params


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_matches_sequential(n_micro):
    from speechain_tpu.parallel.pipeline import (pipeline_apply,
                                                 stack_layer_params)

    D, S, L_LAYERS = 16, 4, 8          # 4 stages x 2 layers each
    layer_fn, params = _layer_stack(L_LAYERS, D)
    stacked = stack_layer_params(params)
    mesh = Mesh(np.asarray(jax.devices()[:S]), ("pipe",))

    B, T = 8, 8
    x = jax.random.normal(RNG, (B, T, D))

    seq = x
    for p in params:
        seq = layer_fn(p, seq)

    pipe = jax.jit(lambda sp, xx: pipeline_apply(
        layer_fn, sp, xx, mesh, n_micro=n_micro))(stacked, x)
    np.testing.assert_allclose(np.asarray(pipe), np.asarray(seq),
                               atol=1e-5)


def test_pipeline_gradients_match_sequential():
    from speechain_tpu.parallel.pipeline import (pipeline_apply,
                                                 stack_layer_params)

    D, S = 16, 4
    layer_fn, params = _layer_stack(S, D)   # 1 layer per stage
    stacked = stack_layer_params(params)
    mesh = Mesh(np.asarray(jax.devices()[:S]), ("pipe",))
    B, T = 4, 8
    x = jax.random.normal(RNG, (B, T, D))
    tgt = jax.random.normal(jax.random.fold_in(RNG, 7), (B, T, D))

    def loss_seq(stacked_p, xx):
        h = xx
        for i in range(S):
            p_i = jax.tree_util.tree_map(lambda l: l[i], stacked_p)
            h = layer_fn(p_i, h)
        return jnp.mean((h - tgt) ** 2)

    def loss_pipe(stacked_p, xx):
        h = pipeline_apply(layer_fn, stacked_p, xx, mesh)
        return jnp.mean((h - tgt) ** 2)

    g_seq = jax.grad(loss_seq)(stacked, x)
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_seq),
                    jax.tree_util.tree_leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
