"""Numeric parity vs torch implementations of the reference's formulas.

These tests rebuild small reference modules in torch (independent
implementations of attention.py / pos_enc.py math), copy the weights into
our flax modules, and require near-exact agreement — catching silent
semantic drift (scaling, masking, LN placement).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from speechain_tpu.nn.attention import MultiHeadedAttention
from speechain_tpu.nn.posenc import PositionalEncoding, sinusoid_table

RNG = jax.random.PRNGKey(0)


def test_mha_matches_torch_reference_formula():
    """Reference MHA (attention.py:16-133): separate k/v/q Linears, scale by
    1/sqrt(d_model) (NOT per-head), mask -> -inf, softmax, out Linear."""
    B, T, D, H = 2, 7, 16, 4
    torch.manual_seed(0)
    k_l = torch.nn.Linear(D, D)
    v_l = torch.nn.Linear(D, D)
    q_l = torch.nn.Linear(D, D)
    o_l = torch.nn.Linear(D, D)
    x = torch.randn(B, T, D)
    mask = torch.ones(B, 1, T, dtype=torch.bool)
    mask[1, 0, 5:] = False

    def torch_forward():
        k = k_l(x).view(B, T, H, D // H).transpose(1, 2)
        v = v_l(x).view(B, T, H, D // H).transpose(1, 2)
        q = q_l(x).view(B, T, H, D // H).transpose(1, 2)
        scores = q @ k.transpose(2, 3) * (1.0 / math.sqrt(D))
        scores = scores.masked_fill(~mask.unsqueeze(1), float("-inf"))
        att = torch.softmax(scores, dim=-1)
        ctx = (att @ v).transpose(1, 2).contiguous().view(B, T, D)
        return o_l(ctx), att

    want, want_att = torch_forward()

    att_mod = MultiHeadedAttention(d_model=D, num_heads=H, dropout=0.0)
    xj = jnp.asarray(x.detach().numpy())
    mj = jnp.asarray(mask.numpy())
    params = att_mod.init({"params": RNG}, xj, xj, xj, mj)

    def load(linear):
        return dict(kernel=jnp.asarray(linear.weight.detach().numpy().T),
                    bias=jnp.asarray(linear.bias.detach().numpy()))

    params = {"params": {"q_layer": load(q_l), "k_layer": load(k_l),
                         "v_layer": load(v_l), "output_layer": load(o_l)}}
    got, got_att = att_mod.apply(params, xj, xj, xj, mj)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5)
    # attention matrices also match (valid region; fully-masked rows differ
    # only in padding convention)
    np.testing.assert_allclose(np.asarray(got_att)[0],
                               want_att.detach().numpy()[0], atol=2e-5)


def test_posenc_matches_reference_table():
    """pos_enc.py:115-143: posenc[p, 2i] = sin(p / exp(2i*ln(1e4)/d)),
    'mix' interleaving; note the reference DIVIDES by exp(+...)."""
    D, L = 16, 50
    pos = torch.arange(0, L, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, D, 2, dtype=torch.float)
                    * (math.log(10000.0) / D))
    want = torch.zeros(L, D)
    want[:, 0::2] = torch.sin(pos / div)
    want[:, 1::2] = torch.cos(pos / div)
    ours = sinusoid_table(L, D, "mix")
    np.testing.assert_allclose(ours, want.numpy(), atol=1e-6)

    # and the module applies emb_scale then adds the table
    pe = PositionalEncoding(d_model=D, dropout=0.0, emb_scale=True,
                            max_len=L)
    x = jnp.ones((1, 5, D))
    v = pe.init(RNG, x)
    out = pe.apply(v, x)
    expect = np.ones((1, 5, D)) * math.sqrt(D) + want.numpy()[None, :5]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_scale_dp_by_head_variant():
    """scale_dp_by_head=True switches to 1/sqrt(head_size)
    (attention.py:61-65)."""
    B, T, D, H = 1, 4, 8, 2
    x = jax.random.normal(RNG, (B, T, D))
    m1 = MultiHeadedAttention(d_model=D, num_heads=H, dropout=0.0,
                              scale_dp_by_head=False)
    m2 = MultiHeadedAttention(d_model=D, num_heads=H, dropout=0.0,
                              scale_dp_by_head=True)
    p = m1.init({"params": RNG}, x, x, x, None)
    o1, a1 = m1.apply(p, x, x, x, None)
    o2, a2 = m2.apply(p, x, x, x, None)
    # different scaling must change the attention distribution
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
