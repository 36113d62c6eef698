"""Zero-length (batch-bucket padding) rows must be inert everywhere.

BlockIterator yields ragged batch sizes; bucketed collation pads with
feat_len=0 / text_len=0 rows. Round-1 advisor findings: such rows NaN'd the
masked softmax (poisoning CTC through NaN*0), diluted feat-norm running
stats, and deflated the accuracy denominator. These are the regression tests.
"""

import jax
import jax.numpy as jnp

from speechain_tpu.ops.feat_norm import (FeatNormConfig, apply_feat_norm,
                                         init_stats)
from speechain_tpu.train.criteria import accuracy, ctc_loss


def test_fully_masked_attention_rows_finite_loss_and_grads():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from speechain_tpu.models.ar_asr import arasr_loss

    net, cfg = ge._build()
    batch = ge._example_batch(B=4, T=8000, L=8)
    batch["feat_len"] = batch["feat_len"].at[3].set(0)
    batch["text_len"] = batch["text_len"].at[3].set(0)
    rng = jax.random.PRNGKey(0)
    variables = net.init(
        {"params": rng, "dropout": rng, "specaug": rng},
        batch["feat"], batch["feat_len"], batch["text"], batch["text_len"],
        train=False)

    def loss_fn(params):
        out = net.apply(
            {"params": params,
             **{k: v for k, v in variables.items() if k != "params"}},
            batch["feat"], batch["feat_len"], batch["text"],
            batch["text_len"], train=False)
        loss, _ = arasr_loss(out, batch["text"], batch["text_len"], cfg)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert jnp.isfinite(loss)
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_ctc_loss_drops_nan_on_invalid_rows():
    B, T, V = 2, 6, 5
    logits = jnp.zeros((B, T, V)).at[1].set(jnp.nan)  # poisoned padding row
    loss = ctc_loss(logits, jnp.array([6, 0]), jnp.ones((B, 3), jnp.int32),
                    jnp.array([3, 0]))
    assert jnp.isfinite(loss)


def test_ctc_loss_zero_infinity_drops_infeasible_rows():
    """Reference criterion/ctc.py:9 defaults zero_infinity=True: a row whose
    alignment is impossible (too few frames for labels + forced blanks) must
    contribute 0 loss/grad, not optax's ~1e5 log_epsilon clamp."""
    B, T, V = 2, 4, 5
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (B, T, V))
    # row 0: labels [1,1,1] -> needs 3 + 2 forced blanks = 5 > T=4 frames
    # row 1: labels [1,2,3] -> needs 3 <= 4, feasible
    text = jnp.array([[1, 1, 1], [1, 2, 3]], jnp.int32)
    tlen = jnp.array([3, 3])
    llen = jnp.array([4, 4])
    loss = ctc_loss(logits, llen, text, tlen)
    feas_only = ctc_loss(logits[1:], llen[1:], text[1:], tlen[1:])
    # zeroed row stays in the denominator (torch zero_infinity semantics)
    assert abs(float(loss) - float(feas_only) / 2) < 1e-4, (loss, feas_only)
    g = jax.grad(lambda lg: ctc_loss(lg, llen, text, tlen))(logits)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g[0]))) == 0.0  # infeasible row: no grad
    assert float(jnp.max(jnp.abs(g[1]))) > 0.0


def test_accuracy_denominator_ignores_padding_rows():
    # 2 rows, row1 is padding (text_len=0 -> -1 after _maybe_shift)
    V = 5
    text = jnp.array([[1, 2, 3, 0], [0, 0, 0, 0]], jnp.int32)
    logits = jax.nn.one_hot(text[:, 1:], V) * 10.0  # predicts perfectly
    acc = accuracy(logits, text, jnp.array([4, 0]))
    assert abs(float(acc) - 1.0) < 1e-6, acc


def test_feat_norm_running_stats_ignore_padding_rows():
    cfg = FeatNormConfig(norm_type="global", feat_dim=3)
    stats = init_stats(cfg)
    feat = jnp.concatenate(
        [jnp.full((1, 8, 3), 5.0), jnp.zeros((1, 8, 3))], 0)
    _, _, new = apply_feat_norm(stats, feat, jnp.array([8, 0], jnp.int32),
                                cfg, train=True,
                                epoch=jnp.zeros((), jnp.int32))
    assert jnp.allclose(new.mean[0], 5.0), new.mean[0]


def test_feat_norm_batch_mode_ignores_padding_rows():
    cfg = FeatNormConfig(norm_type="batch", feat_dim=3)
    feat = jnp.concatenate(
        [jnp.full((1, 8, 3), 5.0) + jnp.arange(8.0)[None, :, None],
         jnp.zeros((1, 8, 3))], 0)
    out, _, _ = apply_feat_norm(None, feat, jnp.array([8, 0], jnp.int32),
                                cfg, train=True)
    m = jnp.mean(out[0], axis=0)
    assert jnp.all(jnp.abs(m) < 1e-4), m
