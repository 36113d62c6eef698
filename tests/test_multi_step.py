"""multi_step_under_mesh: K scanned train steps inside one executable must
advance (state, loss) exactly like K sequential train_step_under_mesh
calls (same fold_in rng schedule), on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _tiny_setup():
    from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
    from speechain_tpu.ops.feat_norm import FeatNormConfig
    from speechain_tpu.ops.frontend import FrontendConfig
    from speechain_tpu.train.optim import build_optimizer
    from speechain_tpu.train.state import init_train_state, make_arasr_step

    V, D = 12, 16
    cfg = ARASRConfig(
        vocab_size=V,
        frontend=FrontendConfig(sr=8000, n_mels=12, win_length=0.02,
                                hop_length=0.01),
        feat_norm=FeatNormConfig(feat_dim=12),
        enc_prenet=dict(conv_dims=[4], lnr_dims=D),
        encoder_type="transformer",
        encoder=dict(d_model=D, num_heads=2, num_layers=1, fdfwd_dim=24),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=2, num_layers=1, fdfwd_dim=24),
        ctc_weight=0.0, label_smoothing=0.0)
    net = ARASRNet(cfg=cfg)
    B, L, T = 8, 4, 1600
    key = jax.random.PRNGKey(0)
    batch = dict(
        feat=jax.random.normal(key, (B, T, 1)) * 0.1,
        feat_len=jnp.full((B,), T, jnp.int32),
        text=jax.random.randint(key, (B, L), 2, V - 1).astype(jnp.int32),
        text_len=jnp.full((B,), L, jnp.int32),
        epoch=jnp.zeros((), jnp.int32))
    variables = net.init({"params": key, "dropout": key, "specaug": key},
                         batch["feat"], batch["feat_len"], batch["text"],
                         batch["text_len"], train=False)
    tx = build_optimizer(optim_conf={"lr": 1e-3}, warmup_steps=10)
    step = make_arasr_step(net, cfg, tx, axis_name="data")
    return step, init_train_state(variables, tx), batch, tx, key


def test_scan_matches_sequential():
    from speechain_tpu.parallel.mesh import (make_mesh,
                                             multi_step_under_mesh,
                                             train_step_under_mesh)

    step, state0, batch, tx, key = _tiny_setup()
    mesh = make_mesh(n_data=8)
    K = 6

    jstep = train_step_under_mesh(step, mesh, donate_state=False)
    st_seq = state0
    losses_seq = []
    for i in range(K):
        st_seq, m = jstep(st_seq, batch, jax.random.fold_in(key, i))
        losses_seq.append(float(m["loss"]))

    jmulti = multi_step_under_mesh(step, mesh, n_steps=K,
                                   donate_state=False)
    st_scan, losses_scan = jmulti(state0, batch, key)

    np.testing.assert_allclose(np.asarray(losses_scan),
                               np.asarray(losses_seq), atol=2e-4)
    assert int(st_scan.step) == int(st_seq.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(st_seq.params),
                    jax.tree_util.tree_leaves(st_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_multi_batch_scan_matches_sequential():
    """multi_batch_step_under_mesh: scanning K DISTINCT stacked batches in
    one executable must match K sequential steps over those batches."""
    import numpy as onp

    from speechain_tpu.parallel.mesh import (make_mesh,
                                             multi_batch_step_under_mesh,
                                             train_step_under_mesh)

    step, state0, batch, tx, key = _tiny_setup()
    mesh = make_mesh(n_data=8)
    K = 4
    batches = []
    for i in range(K):
        b = dict(batch)
        b["feat"] = batch["feat"] + 0.01 * (i + 1)
        b["text"] = (batch["text"] + i) % 10 + 2
        batches.append(b)

    jstep = train_step_under_mesh(step, mesh, donate_state=False)
    st_seq = state0
    losses_seq = []
    for b in batches:
        # same rng every call: the step folds it with state.step itself,
        # which is exactly what the scanned form relies on
        st_seq, m = jstep(st_seq, b, key)
        losses_seq.append(float(m["loss"]))

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], 0), *batches)
    jmulti = multi_batch_step_under_mesh(step, mesh, donate_state=False)
    st_scan, metrics = jmulti(state0, stacked, key)
    onp.testing.assert_allclose(onp.asarray(metrics["loss"]),
                                onp.asarray(losses_seq), atol=2e-5)
    assert int(st_scan.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(st_seq.params),
                    jax.tree_util.tree_leaves(st_scan.params)):
        onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b),
                                    atol=1e-3)
