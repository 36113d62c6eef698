"""GSPMD numerical-equivalence: one SGD train step on a 1-device mesh must
match a 4x2 dp x tp mesh and an 8x1 dp mesh — the partitioner only changes
WHERE compute happens (SURVEY §5.8 mapping: grads/stats via the
partitioner's inserted collectives).

SGD, not Adam: with near-zero gradients Adam's normalization amplifies
reduction-order rounding into direction flips, so adaptive optimizers are
not a well-posed equivalence target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speechain_tpu.nn.lm import LanguageModelNet, LMConfig
from speechain_tpu.parallel.mesh import make_mesh, train_step_gspmd
from speechain_tpu.train.state import init_train_state, make_lm_step

pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


@pytest.mark.parametrize("layout", [(4, 2), (8, 1)])
def test_gspmd_step_matches_single_device(layout):
    cfg = LMConfig(vocab_size=32, emb=dict(embedding_dim=32),
                   encoder=dict(d_model=32, num_heads=4, num_layers=2,
                                fdfwd_dim=128))
    net = LanguageModelNet(cfg=cfg)
    B, L = 8, 16
    text = jax.random.randint(RNG, (B, L), 1, 31)
    batch = dict(text=text, text_len=jnp.full((B,), L, jnp.int32))
    variables = net.init({"params": RNG, "dropout": RNG}, batch["text"],
                         batch["text_len"])
    tx = optax.sgd(1e-2)
    step = make_lm_step(net, tx, axis_name=None, train=True)

    def one_step(n_data, n_model, n_seq=1):
        mesh = make_mesh(n_data=n_data, n_model=n_model, n_seq=n_seq)
        jstep = train_step_gspmd(step, mesh, donate_state=False)
        state = init_train_state(variables, tx)
        new_state, metrics = jstep(state, batch, RNG)
        return jax.device_get(new_state.params), float(metrics["loss"])

    p1, l1 = one_step(1, 1)
    pN, lN = one_step(*layout)
    assert abs(l1 - lN) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_gspmd_seq_parallel_matches_single_device():
    """dp2 x seq2 x tp2: the token axis of the batch is sharded over 'seq'
    (sequence parallelism) on top of dp x tp; one SGD step must still match
    the 1-device step — the partitioner only moves compute."""
    cfg = LMConfig(vocab_size=32, emb=dict(embedding_dim=32),
                   encoder=dict(d_model=32, num_heads=4, num_layers=2,
                                fdfwd_dim=128))
    net = LanguageModelNet(cfg=cfg)
    B, L = 8, 16
    text = jax.random.randint(RNG, (B, L), 1, 31)
    batch = dict(text=text, text_len=jnp.full((B,), L, jnp.int32))
    variables = net.init({"params": RNG, "dropout": RNG}, batch["text"],
                         batch["text_len"])
    tx = optax.sgd(1e-2)
    step = make_lm_step(net, tx, axis_name=None, train=True)

    def one_step(n_data, n_model, n_seq):
        mesh = make_mesh(n_data=n_data, n_model=n_model, n_seq=n_seq)
        assert ("seq" in mesh.axis_names) == (n_seq > 1)
        jstep = train_step_gspmd(step, mesh, donate_state=False)
        state = init_train_state(variables, tx)
        new_state, metrics = jstep(state, batch, RNG)
        return jax.device_get(new_state.params), float(metrics["loss"])

    p1, l1 = one_step(1, 1, 1)
    pN, lN = one_step(2, 2, 2)
    assert abs(l1 - lN) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(a, b, atol=1e-6)
