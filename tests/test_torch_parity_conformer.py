"""Torch-differential goldens for the conformer core (VERDICT r4 #4).

In-test torch replicas (the tests/test_speaker_interop.py technique) of
the reference's conformer pieces, weights copied into the flax modules,
asserting FORWARD and GRADIENT parity at fp32 tolerances:

- RelPosMultiHeadedAttention: pos_bias_u/v + the zero-pad/view
  `rel_shift` + the non-standard 1/sqrt(d_model) scale
  (reference conformer/attention.py:7-84) — a transposed index in
  rel_shift becomes a red test here.
- ConvolutionModule incl. BatchNorm-over-PADDED-frames semantics
  (reference conformer/encoder.py:14-65): torch BatchNorm1d computes
  batch stats over every frame, padded or not; running_var differs from
  flax by the Bessel n/(n-1) factor (torch stores the unbiased var),
  which the test corrects for explicitly.
- One full macaron ConformerEncoderLayer (encoder.py:66-175):
  front FFN half -> relpos MHA -> conv module -> rear FFN half, each
  residual with its own eps-1e-6 LayerNorm, layernorm_first both ways.
- SpecAugment time-warp segment law vs
  torch.nn.functional.interpolate(align_corners=True)
  (reference augment/specaug.py:88-127). The reference defaults to
  BICUBIC; the repo deliberately uses the linear family (jit-friendly
  gather — ops/specaug.py docstring), so the golden pins the LINEAR
  align-corners law: same segment geometry, mode='bilinear'.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from speechain_tpu.nn.attention import RelPosMultiHeadedAttention
from speechain_tpu.nn.conformer import ConformerEncoderLayer, ConvolutionModule

RNG = jax.random.PRNGKey(0)
torch.manual_seed(0)


def _lin(d_in, d_out, bias=True):
    return torch.nn.Linear(d_in, d_out, bias=bias)


def _load_lin(linear):
    p = dict(kernel=jnp.asarray(linear.weight.detach().numpy().T))
    if linear.bias is not None:
        p["bias"] = jnp.asarray(linear.bias.detach().numpy())
    return p


def _torch_rel_shift(mbd):
    # reference conformer/attention.py:26-46, verbatim semantics
    B, H, T, L = mbd.shape
    zero_pad = torch.zeros(B, H, T, 1, dtype=mbd.dtype)
    p = torch.cat([zero_pad, mbd], dim=-1)          # (B, H, T, 2T)
    p = p.view(B, H, L + 1, T)
    return p[:, :, 1:].reshape(B, H, T, L)[:, :, :, : L // 2 + 1]


class _TorchRelPosMHA(torch.nn.Module):
    """Replica of reference conformer/attention.py:7-84."""

    def __init__(self, d, h):
        super().__init__()
        self.d, self.h, self.dh = d, h, d // h
        self.k_layer, self.v_layer, self.q_layer = (
            _lin(d, d), _lin(d, d), _lin(d, d))
        self.output_layer = _lin(d, d)
        self.pos_layer = _lin(d, d, bias=False)
        self.pos_bias_u = torch.nn.Parameter(torch.randn(h, d // h) * 0.3)
        self.pos_bias_v = torch.nn.Parameter(torch.randn(h, d // h) * 0.3)
        self.scale = 1.0 / math.sqrt(d)             # NOT per-head

    def forward(self, x, mask, posenc):
        B, T, D = x.shape
        sp = lambda t: t.view(B, -1, self.h, self.dh).transpose(1, 2)
        k, v, q = sp(self.k_layer(x)), sp(self.v_layer(x)), sp(self.q_layer(x))
        qu = q + self.pos_bias_u[None, :, None, :]
        qv = q + self.pos_bias_v[None, :, None, :]
        pe = (self.pos_layer(posenc)
              .view(posenc.size(0), -1, self.h, self.dh).transpose(1, 2))
        ac = torch.matmul(qu, k.transpose(2, 3))
        bd = _torch_rel_shift(torch.matmul(qv, pe.transpose(2, 3)))
        scores = (ac + bd) * self.scale
        if mask is not None:
            scores = scores.masked_fill(~mask.unsqueeze(1), float("-inf"))
        att = torch.softmax(scores, dim=-1)
        ctx = (att @ v).transpose(1, 2).contiguous().view(B, T, D)
        return self.output_layer(ctx)


def _relpos_params(tm):
    return {
        "q_layer": _load_lin(tm.q_layer), "k_layer": _load_lin(tm.k_layer),
        "v_layer": _load_lin(tm.v_layer),
        "output_layer": _load_lin(tm.output_layer),
        "pos_layer": _load_lin(tm.pos_layer),
        "pos_bias_u": jnp.asarray(tm.pos_bias_u.detach().numpy()),
        "pos_bias_v": jnp.asarray(tm.pos_bias_v.detach().numpy()),
    }


def test_relpos_mha_matches_torch():
    B, T, D, H = 2, 9, 16, 4
    tm = _TorchRelPosMHA(D, H)
    x = torch.randn(B, T, D, requires_grad=True)
    pe = torch.randn(1, 2 * T - 1, D)
    mask = torch.ones(B, 1, T, dtype=torch.bool)
    mask[1, 0, 6:] = False
    w = torch.cos(torch.arange(B * T * D, dtype=torch.float32) * 0.37)
    out = tm(x, mask, pe)
    loss = (out.reshape(-1) * w).sum()
    loss.backward()

    mod = RelPosMultiHeadedAttention(d_model=D, num_heads=H, dropout=0.0)
    xj = jnp.asarray(x.detach().numpy())
    pj = jnp.asarray(pe.numpy())
    mj = jnp.asarray(mask.numpy())
    params = {"params": _relpos_params(tm)}
    wj = jnp.asarray(w.numpy())

    def f(p, xx):
        o, _ = mod.apply(p, xx, xx, xx, mj, pj)
        return jnp.sum(o.reshape(-1) * wj), o

    (lj, oj), (gp, gx) = jax.value_and_grad(f, argnums=(0, 1),
                                            has_aux=True)(params, xj)
    np.testing.assert_allclose(np.asarray(oj), out.detach().numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), x.grad.numpy(),
                               atol=2e-4, rtol=2e-4)
    got = gp["params"]
    np.testing.assert_allclose(np.asarray(got["pos_bias_u"]),
                               tm.pos_bias_u.grad.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["pos_bias_v"]),
                               tm.pos_bias_v.grad.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["pos_layer"]["kernel"]),
                               tm.pos_layer.weight.grad.numpy().T,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got["q_layer"]["kernel"]),
                               tm.q_layer.weight.grad.numpy().T,
                               atol=2e-4, rtol=2e-4)


class _TorchConvModule(torch.nn.Module):
    """Replica of reference conformer/encoder.py:14-65."""

    def __init__(self, c, k):
        super().__init__()
        self.pointwise_conv1 = torch.nn.Conv1d(c, 2 * c, 1)
        self.depthwise_conv = torch.nn.Conv1d(c, c, k, groups=c,
                                              padding=(k - 1) // 2)
        self.batch_norm = torch.nn.BatchNorm1d(c)
        self.pointwise_conv2 = torch.nn.Conv1d(c, c, 1)

    def forward(self, feat):
        x = feat.transpose(1, 2)
        x = torch.nn.functional.glu(self.pointwise_conv1(x), dim=1)
        x = self.depthwise_conv(x)
        x = torch.nn.functional.silu(self.batch_norm(x))
        return self.pointwise_conv2(x).transpose(1, 2)


def _pw_params(conv):
    return dict(kernel=jnp.asarray(
        conv.weight.detach().numpy()[:, :, 0].T)[None],
        bias=jnp.asarray(conv.bias.detach().numpy()))


def _conv_module_params(tm, k):
    return {
        "pointwise_conv1": _pw_params(tm.pointwise_conv1),
        "pointwise_conv2": _pw_params(tm.pointwise_conv2),
        "depthwise_conv": dict(
            kernel=jnp.asarray(
                tm.depthwise_conv.weight.detach().numpy()
                .transpose(2, 1, 0)),              # (C,1,K) -> (K,1,C)
            bias=jnp.asarray(tm.depthwise_conv.bias.detach().numpy())),
        "batch_norm": dict(
            scale=jnp.asarray(tm.batch_norm.weight.detach().numpy()),
            bias=jnp.asarray(tm.batch_norm.bias.detach().numpy())),
    }


def test_conv_module_matches_torch_incl_padded_frame_bn():
    B, T, C, K = 3, 17, 8, 5
    tm = _TorchConvModule(C, K).train()
    feat = torch.randn(B, T, C)
    # BatchNorm semantics under test: stats INCLUDE padded frames —
    # zero the tail of row 2 like a padded batch and keep it in the stats
    feat[2, 11:] = 0.0
    feat.requires_grad_(True)
    out = tm(feat)
    w = torch.cos(torch.arange(out.numel(), dtype=torch.float32) * 0.29)
    (out.reshape(-1) * w).sum().backward()

    mod = ConvolutionModule(channels=C, depthwise_kernel_size=K,
                            dtype=jnp.float32)
    fj = jnp.asarray(feat.detach().numpy())
    variables = mod.init({"params": RNG}, fj, train=False)
    params = _conv_module_params(tm, K)
    stats = variables["batch_stats"]
    wj = jnp.asarray(w.numpy())

    def f(p, xx):
        o, mut = mod.apply({"params": p, "batch_stats": stats}, xx,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(o.reshape(-1) * wj), (o, mut)

    (lj, (oj, mut)), (gp, gx) = jax.value_and_grad(
        f, argnums=(0, 1), has_aux=True)(params, fj)
    np.testing.assert_allclose(np.asarray(oj), out.detach().numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), feat.grad.numpy(),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gp["depthwise_conv"]["kernel"]),
        tm.depthwise_conv.weight.grad.numpy().transpose(2, 1, 0),
        atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(gp["batch_norm"]["scale"]),
        tm.batch_norm.weight.grad.numpy(), atol=2e-3, rtol=2e-3)
    # running stats: torch's momentum-0.1 update matches flax momentum
    # 0.9; torch stores the UNBIASED running var (Bessel n/(n-1)),
    # flax the biased one — correct for it explicitly
    n = B * T
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["batch_norm"]["mean"]),
        tm.batch_norm.running_mean.detach().numpy(), atol=1e-5)
    torch_var_biased = (
        (tm.batch_norm.running_var.detach().numpy() - 0.9)
        * (n - 1) / n + 0.9)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["batch_norm"]["var"]),
        torch_var_biased, atol=1e-5)


class _TorchFFN(torch.nn.Module):
    def __init__(self, d, ff):
        super().__init__()
        self.in_layer, self.out_layer = _lin(d, ff), _lin(ff, d)

    def forward(self, x):
        return self.out_layer(torch.nn.functional.gelu(self.in_layer(x)))


class _TorchConformerLayer(torch.nn.Module):
    """Replica of reference conformer/encoder.py:66-175 (dropout 0)."""

    def __init__(self, d, h, k, ff, ln_first):
        super().__init__()
        self.front_feed_forward = _TorchFFN(d, ff)
        self.front_fdfwd_layernorm = torch.nn.LayerNorm(d, eps=1e-6)
        self.relpos_mha = _TorchRelPosMHA(d, h)
        self.mha_layernorm = torch.nn.LayerNorm(d, eps=1e-6)
        self.conv_module = _TorchConvModule(d, k)
        self.conv_layernorm = torch.nn.LayerNorm(d, eps=1e-6)
        self.rear_feed_forward = _TorchFFN(d, ff)
        self.rear_fdfwd_layernorm = torch.nn.LayerNorm(d, eps=1e-6)
        self.ln_first = ln_first

    def forward(self, src, mask, posenc):
        x = self.front_fdfwd_layernorm(src) if self.ln_first else src
        x = 0.5 * self.front_feed_forward(x) + src
        if not self.ln_first:
            x = self.front_fdfwd_layernorm(x)
        y = self.mha_layernorm(x) if self.ln_first else x
        y = self.relpos_mha(y, mask, posenc) + x
        if not self.ln_first:
            y = self.mha_layernorm(y)
        z = self.conv_layernorm(y) if self.ln_first else y
        z = self.conv_module(z) + y
        if not self.ln_first:
            z = self.conv_layernorm(z)
        w = self.rear_fdfwd_layernorm(z) if self.ln_first else z
        w = 0.5 * self.rear_feed_forward(w) + z
        if not self.ln_first:
            w = self.rear_fdfwd_layernorm(w)
        return w


def _ln_params(ln):
    return dict(scale=jnp.asarray(ln.weight.detach().numpy()),
                bias=jnp.asarray(ln.bias.detach().numpy()))


def _ffn_params(tf):
    return {"in_layer": _load_lin(tf.in_layer),
            "out_layer": _load_lin(tf.out_layer)}


@pytest.mark.parametrize("ln_first", [True, False])
def test_conformer_layer_matches_torch(ln_first):
    B, T, D, H, K, FF = 2, 13, 16, 4, 5, 32
    tm = _TorchConformerLayer(D, H, K, FF, ln_first).train()
    src = torch.randn(B, T, D, requires_grad=True)
    pe = torch.randn(1, 2 * T - 1, D)
    mask = torch.ones(B, 1, T, dtype=torch.bool)
    mask[1, 0, 9:] = False
    out = tm(src, mask, pe)
    w = torch.cos(torch.arange(out.numel(), dtype=torch.float32) * 0.31)
    (out.reshape(-1) * w).sum().backward()

    mod = ConformerEncoderLayer(
        d_model=D, num_heads=H, att_dropout=0.0, depthwise_kernel_size=K,
        fdfwd_dim=FF, fdfwd_activation="GELU", fdfwd_dropout=0.0,
        res_dropout=0.0, layernorm_first=ln_first, dtype=jnp.float32)
    sj = jnp.asarray(src.detach().numpy())
    pj = jnp.asarray(pe.numpy())
    mj = jnp.asarray(mask.numpy())
    variables = mod.init({"params": RNG, "dropout": RNG}, sj, mj, pj,
                         train=False)
    params = {
        "front_feed_forward": _ffn_params(tm.front_feed_forward),
        "front_fdfwd_layernorm": _ln_params(tm.front_fdfwd_layernorm),
        "relpos_mha": _relpos_params(tm.relpos_mha),
        "mha_layernorm": _ln_params(tm.mha_layernorm),
        "conv_module": _conv_module_params(tm.conv_module, K),
        "conv_layernorm": _ln_params(tm.conv_layernorm),
        "rear_feed_forward": _ffn_params(tm.rear_feed_forward),
        "rear_fdfwd_layernorm": _ln_params(tm.rear_fdfwd_layernorm),
    }
    stats = variables["batch_stats"]
    wj = jnp.asarray(w.numpy())

    def f(xx):
        (o, _), _ = mod.apply(
            {"params": params, "batch_stats": stats}, xx, mj, pj,
            train=True, return_attmat=False, mutable=["batch_stats"],
            rngs={"dropout": RNG})
        return jnp.sum(o.reshape(-1) * wj), o

    (lj, oj), gx = jax.value_and_grad(f, has_aux=True)(sj)
    np.testing.assert_allclose(np.asarray(oj), out.detach().numpy(),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(gx), src.grad.numpy(),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("center,target,minlen", [
    (6, 3, 14), (6, 9, 14), (7, 2, 15), (3, 7, 15), (8, 8, 16),
    (2, 1, 12),                                    # degenerate 1-row left
])
def test_time_warp_segment_law_matches_torch_interpolate(center, target,
                                                         minlen):
    from speechain_tpu.ops.specaug import warp_segments
    B, T, D = 2, 18, 7
    torch.manual_seed(center * 100 + target)
    feat = torch.randn(B, T, D)
    f4 = feat.unsqueeze(1).clone()
    want = feat.clone()
    left = torch.nn.functional.interpolate(
        f4[:, :, :center], size=(target, D), mode="bilinear",
        align_corners=True)
    right = torch.nn.functional.interpolate(
        f4[:, :, center:minlen], size=(minlen - target, D),
        mode="bilinear", align_corners=True)
    want[:, :target] = left[:, 0]
    want[:, target:minlen] = right[:, 0]

    got = warp_segments(jnp.asarray(feat.numpy()), center, target, minlen)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
