"""Prenet modules: embedding, linear, conv1d, conv2d, speaker-embedding,
variance-predictor.

Rebuild of reference ``module/prenet/*`` (file:line cited per class).
Convolutions are channels-last (flax convention) — the reference's
(B, C, T) transposes disappear.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Union

import flax.linen as nn

from speechain_tpu.nn.norms import FastBatchNorm
import jax
import jax.numpy as jnp

from speechain_tpu.nn.feed_forward import get_activation

Array = jnp.ndarray


def _as_list(x, n=None):
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x] * (n if n is not None else 1)


class EmbedPrenet(nn.Module):
    """Token embedding with optional sqrt(d) scale (prenet/embed.py:14-66).

    padding_idx rows are kept at zero like torch's padding_idx=0.
    """

    vocab_size: int
    embedding_dim: int
    scale: bool = False
    emb_scale: Optional[bool] = None   # reference kwarg name (embed.py:14)
    padding_idx: Optional[int] = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text: Array) -> Array:
        emb = nn.Embed(self.vocab_size, self.embedding_dim,
                       dtype=self.dtype, name="embed")(text)
        if self.padding_idx is not None:
            emb = jnp.where((text == self.padding_idx)[..., None], 0.0, emb)
        scale = self.scale if self.emb_scale is None else self.emb_scale
        if scale:
            emb = emb * math.sqrt(self.embedding_dim)
        return emb


class Conv1dEv(nn.Module):
    """1-D conv with 'valid' / 'full' / 'same' / 'causal' padding emulation
    (prenet/conv1d.py:21-122). Input/output are (B, T, C) channels-last.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding_mode: str = "same"
    use_bias: bool = True
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: Array) -> Array:
        k, d = self.kernel_size, self.dilation
        cutoff = False
        if self.padding_mode == "valid":
            padding = [(0, 0)]
        elif self.padding_mode == "full":
            p = d * (k - 1)
            padding = [(p, p)]
        elif self.padding_mode == "same":
            assert self.stride == 1, "stride must be 1 for 'same' padding"
            if k % 2 == 0:
                p = d * k // 2
                padding = [(p, p)]
                cutoff = True
            else:
                p = d * (k - 1) // 2
                padding = [(p, p)]
        elif self.padding_mode == "causal":
            padding = [(d * (k - 1), 0)]
        else:
            raise ValueError(f"unsupported padding mode {self.padding_mode!r}")
        out = nn.Conv(self.out_channels, kernel_size=(k,),
                      strides=(self.stride,), kernel_dilation=(d,),
                      padding=padding, use_bias=self.use_bias,
                      feature_group_count=self.groups, dtype=self.dtype,
                      name="conv_lyr")(feat)
        if cutoff:
            # even-kernel 'same': drop the trailing `dilation` extra outputs
            out = out[:, : -self.dilation]
        return out


class LinearPrenet(nn.Module):
    """Stacked Linear(+activation+dropout) blocks (prenet/linear.py:18-128).

    zero_centered skips a centre-shifting (ReLU-family) activation on the
    final layer.
    """

    lnr_dims: Union[int, Sequence[int]]
    lnr_activation: Optional[str] = "ReLU"
    lnr_dropout: Union[None, float, Sequence[float]] = None
    zero_centered: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: Array, feat_len: Optional[Array] = None, *,
                 train: bool = False):
        dims = _as_list(self.lnr_dims)
        drops = (_as_list(self.lnr_dropout, len(dims))
                 if self.lnr_dropout is not None else [None] * len(dims))
        from speechain_tpu.nn.attention import _dense_flat
        for i, dim in enumerate(dims):
            feat = _dense_flat(
                nn.Dense(dim, dtype=self.dtype, name=f"linear_{i}"), feat)
            if self.lnr_activation is not None:
                last = i == len(dims) - 1
                if not (last and self.zero_centered
                        and "ReLU" in self.lnr_activation):
                    feat = get_activation(self.lnr_activation)(feat)
            if drops[i] is not None:
                feat = nn.Dropout(drops[i], deterministic=not train)(feat)
        return feat, feat_len

    @staticmethod
    def output_size(lnr_dims) -> int:
        return _as_list(lnr_dims)[-1]


class Conv1dPrenet(nn.Module):
    """Conv1d blocks (+BatchNorm+act+dropout) then optional Linear blocks —
    the TTS-encoder prenet (prenet/conv1d.py:131-324).

    lnr_dims entries of -1 inherit the previous layer's width.
    """

    conv_dims: Union[int, Sequence[int]] = (512, 512, 512)
    conv_kernel: int = 5
    conv_stride: int = 1
    conv_batchnorm: bool = True
    conv_activation: Optional[str] = "ReLU"
    conv_dropout: Union[None, float, Sequence[float]] = None
    lnr_dims: Union[None, int, Sequence[int]] = -1
    lnr_activation: Optional[str] = None
    lnr_dropout: Union[None, float, Sequence[float]] = None
    zero_centered: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feat: Array, feat_len: Optional[Array] = None, *,
                 train: bool = False):
        conv_dims = _as_list(self.conv_dims)
        drops = (_as_list(self.conv_dropout, len(conv_dims))
                 if self.conv_dropout is not None else [None] * len(conv_dims))
        for i, dim in enumerate(conv_dims):
            feat = Conv1dEv(out_channels=dim, kernel_size=self.conv_kernel,
                            stride=self.conv_stride, padding_mode="same",
                            use_bias=not self.conv_batchnorm,
                            dtype=self.dtype, name=f"conv_{i}")(feat)
            if self.conv_batchnorm:
                feat = FastBatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    axis_name=self.bn_axis_name,
                                    name=f"batchnorm_{i}")(feat)
            if self.conv_activation is not None:
                last = i == len(conv_dims) - 1 and self.lnr_dims is None
                if not (last and self.zero_centered
                        and "ReLU" in self.conv_activation):
                    feat = get_activation(self.conv_activation)(feat)
            if drops[i] is not None:
                feat = nn.Dropout(drops[i], deterministic=not train)(feat)

        if self.lnr_dims is not None:
            lnr_dims = _as_list(self.lnr_dims)
            prev = conv_dims[-1]
            resolved = []
            for d in lnr_dims:
                d = prev if d == -1 else d
                resolved.append(d)
                prev = d
            feat, feat_len = LinearPrenet(
                lnr_dims=resolved, lnr_activation=self.lnr_activation,
                lnr_dropout=self.lnr_dropout, zero_centered=self.zero_centered,
                dtype=self.dtype, name="linear")(feat, feat_len, train=train)
        return feat, feat_len


class _Conv2dParams(nn.Module):
    """nn.Conv-compatible {kernel (kh, kw, Cin, Cout)} params without the
    conv — consumed by the fused prenet kernel; tree byte-identical to
    nn.Conv(use_bias=False, name=<same>)."""

    kh: int
    kw: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.kh, self.kw, self.cin, self.cout),
                          jnp.float32)


class _BNAffine(nn.Module):
    """flax.linen.BatchNorm-compatible params/stats that RETURNS the
    normalization affine (g = gamma/sigma, b = beta - mu*g) instead of
    applying it — the fused prenet kernel applies it in-pass. Batch
    moments arrive precomputed (analytically, from the patch statistics:
    ops/pallas_prenet.py); running stats update + axis_name pmean sync
    match nn.BatchNorm (momentum 0.9, eps 1e-5)."""

    channels: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, batch_mean, batch_mean2, *, train: bool):
        scale = self.param("scale", nn.initializers.ones,
                           (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.channels,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros,
                                (self.channels,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", jnp.ones,
                               (self.channels,), jnp.float32)
        if train:
            mean, mean2 = batch_mean, batch_mean2
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1.0 - self.momentum)
                                 * jax.lax.stop_gradient(mean))
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum)
                                * jax.lax.stop_gradient(var))
        else:
            mean, var = ra_mean.value, ra_var.value
        g = scale * jax.lax.rsqrt(var + self.epsilon)
        return g, bias - mean * g


def _prenet_fused_impl(conv_dims, kernel, stride, pad, batchnorm, drops,
                       act, T: int, F: int):
    """'xla' | 'pallas' | None: which fused-prenet core applies to this
    configuration (ops/pallas_prenet.py gating + shape constraints)."""
    from speechain_tpu.ops.pallas_prenet import geom, prenet_core_impl
    impl = prenet_core_impl()
    if impl is None:
        return None
    if (len(conv_dims) != 2 or conv_dims[0] != conv_dims[1]
            or conv_dims[0] % 128 != 0):
        return None
    if kernel != (3, 3) or stride != (2, 2) or pad != (0, 0):
        return None
    if not batchnorm or any(d is not None for d in drops):
        return None
    if act is None:
        return None
    U1, F1, T2, F2, _, _ = geom(T, F)
    if not (T2 >= 2 and F2 >= 1):
        return None
    return impl


class Conv2dPrenet(nn.Module):
    """2-D conv downsampling + linear projection — the ASR-encoder prenet
    (Speech-Transformer style, prenet/conv2d.py:15-280).

    Input (B, T, F) is treated as a 1-channel image (B, T, F, 1); each conv
    block halves (stride 2, kernel 3, no padding by default) both axes; the
    output is flattened back to (B, T', C*F') and optionally projected.
    Length recurrence: len = (len - kernel_t) // stride_t + 1 per block
    (conv2d.py:244-252).
    """

    conv_dims: Union[int, Sequence[int]] = (64, 64)
    conv_kernel: Union[int, Sequence[int]] = 3
    conv_stride: Union[int, Sequence[int]] = 2
    conv_padding: Union[int, Sequence[int]] = 0
    conv_batchnorm: bool = False
    conv_activation: Optional[str] = "ReLU"
    conv_dropout: Union[None, float, Sequence[float]] = None
    lnr_dims: Union[None, int, Sequence[int]] = 512
    lnr_activation: Optional[str] = None
    lnr_dropout: Union[None, float, Sequence[float]] = None
    zero_centered: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @staticmethod
    def out_len(feat_len: Array, conv_dims, conv_kernel, conv_stride) -> Array:
        kt = (conv_kernel[0] if isinstance(conv_kernel, (list, tuple))
              else conv_kernel)
        st = (conv_stride[0] if isinstance(conv_stride, (list, tuple))
              else conv_stride)
        n = len(conv_dims) if isinstance(conv_dims, (list, tuple)) else 1
        for _ in range(n):
            feat_len = (feat_len - kt) // st + 1
        return feat_len

    @nn.compact
    def __call__(self, feat: Array, feat_len: Array, *, train: bool = False):
        conv_dims = _as_list(self.conv_dims)
        kernel = (tuple(self.conv_kernel)
                  if isinstance(self.conv_kernel, (list, tuple))
                  else (self.conv_kernel, self.conv_kernel))
        stride = (tuple(self.conv_stride)
                  if isinstance(self.conv_stride, (list, tuple))
                  else (self.conv_stride, self.conv_stride))
        pad = (tuple(self.conv_padding)
               if isinstance(self.conv_padding, (list, tuple))
               else (self.conv_padding, self.conv_padding))
        drops = (_as_list(self.conv_dropout, len(conv_dims))
                 if self.conv_dropout is not None else [None] * len(conv_dims))

        fused_impl = _prenet_fused_impl(conv_dims, kernel, stride, pad,
                                        self.conv_batchnorm, drops,
                                        self.conv_activation,
                                        feat.shape[1], feat.shape[2])
        if fused_impl is not None:
            # fused conv1+BN1+act+conv2 core (ops/pallas_prenet.py): the
            # conv1 BatchNorm batch moments come analytically from the
            # patch sufficient statistics, so BN1 folds into the conv1
            # epilogue (xla core) or the kernel's in-pass affine (pallas
            # core); BN2 + act + flatten + linear stay as below
            from speechain_tpu.ops import pallas_prenet as pk
            C = conv_dims[0]
            B, T, F = feat.shape
            U1, F1, T2, F2, Up, Vp = pk.geom(T, F)
            w1 = _Conv2dParams(3, 3, 1, C, name="conv_0")()
            w2 = _Conv2dParams(3, 3, C, C, name="conv_1")()
            cd = self.dtype
            if fused_impl == "xla":
                M = pk.build_patches_std(feat, cd)
                w1f = w1.reshape(9, C)
            else:
                M = pk.build_patches(feat, cd)
                w1f = jnp.pad(w1.reshape(9, C), ((0, 7), (0, 0)))
            if train:
                if fused_impl == "xla":
                    S, G = pk.patch_stats_std(M)
                else:
                    # the pallas kernel's custom vjp returns dM = 0, so
                    # the stats must not leak a PARTIAL input gradient
                    # through S/G either — input grads are unsupported
                    # on this core (exact on the xla core)
                    S, G = pk.patch_stats(jax.lax.stop_gradient(M))
                n1 = B * U1 * F1
                mean1 = (S @ w1f) / n1
                mean2 = jnp.einsum("jc,jk,kc->c", w1f,
                                   G.astype(jnp.float32), w1f) / n1
            else:
                mean1 = mean2 = jnp.zeros((C,), jnp.float32)
            g1, b1 = _BNAffine(channels=C, axis_name=self.bn_axis_name,
                               name="batchnorm_0")(mean1, mean2,
                                                   train=train)
            if fused_impl == "xla":
                x = pk.xla_prenet_core(M, w1f, g1, b1, w2,
                                       self.conv_activation)
            else:
                out20 = pk.fused_prenet_core(M, w1f, g1, b1,
                                             w2.reshape(9, C, C),
                                             T2, F2, self.conv_activation)
                x = out20.reshape(B, T2, Vp, C)[:, :, :F2, :]
            x = FastBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name,
                             name="batchnorm_1")(x)
            x = get_activation(self.conv_activation)(x)
            feat = x.reshape(B, T2, F2 * C)
            feat_len = self.out_len(feat_len, conv_dims, kernel, stride)
            if self.lnr_dims is not None:
                feat, feat_len = LinearPrenet(
                    lnr_dims=_as_list(self.lnr_dims),
                    lnr_activation=self.lnr_activation,
                    lnr_dropout=self.lnr_dropout,
                    zero_centered=self.zero_centered,
                    dtype=self.dtype, name="linear")(feat, feat_len,
                                                     train=train)
            return feat, feat_len

        x = feat[..., None]  # (B, T, F, 1)
        for i, dim in enumerate(conv_dims):
            x = nn.Conv(dim, kernel_size=kernel, strides=stride,
                        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                        use_bias=not self.conv_batchnorm, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            if self.conv_batchnorm:
                x = FastBatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 axis_name=self.bn_axis_name,
                                 name=f"batchnorm_{i}")(x)
            if self.conv_activation is not None:
                last = i == len(conv_dims) - 1 and self.lnr_dims is None
                if not (last and self.zero_centered
                        and "ReLU" in self.conv_activation):
                    x = get_activation(self.conv_activation)(x)
            if drops[i] is not None:
                x = nn.Dropout(drops[i], deterministic=not train)(x)

        B, T2, F2, C = x.shape
        feat = x.reshape(B, T2, F2 * C)
        feat_len = self.out_len(feat_len, conv_dims, kernel, stride)

        if self.lnr_dims is not None:
            feat, feat_len = LinearPrenet(
                lnr_dims=_as_list(self.lnr_dims),
                lnr_activation=self.lnr_activation,
                lnr_dropout=self.lnr_dropout, zero_centered=self.zero_centered,
                dtype=self.dtype, name="linear")(feat, feat_len, train=train)
        return feat, feat_len


class SpeakerEmbedPrenet(nn.Module):
    """Speaker-embedding combination prenet (prenet/spk_embed.py:7-230).

    Supports a close-set lookup table (``spk_num``) and/or an open-set
    pretrained embedding (``spk_emb_dim_pretrained``); embeddings are
    L2-normalized, projected to d_model, then combined into encoder outputs
    (and optionally decoder inputs) by 'add' or 'concat'+projection.
    """

    d_model: int
    spk_emb_dim_lookup: Optional[int] = None
    spk_num: Optional[int] = None
    spk_emb_dim_pretrained: Optional[int] = None
    spk_emb_comb: str = "concat"  # 'add' | 'concat'
    use_dec_comb: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.use_lookup = self.spk_num is not None
        self.use_pretrained = self.spk_emb_dim_pretrained is not None
        assert self.use_lookup or self.use_pretrained
        if self.use_lookup:
            dim = self.spk_emb_dim_lookup or self.d_model
            self.spk_lookup = nn.Embed(self.spk_num, dim, dtype=self.dtype,
                                       name="lookup")
            self.lookup_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                        name="lookup_proj")
        if self.use_pretrained:
            self.pretrained_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                            name="pretrained_proj")
        n_emb = int(self.use_lookup) + int(self.use_pretrained)
        if self.spk_emb_comb == "concat":
            self.enc_comb_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                          name="enc_comb_proj")
            if self.use_dec_comb:
                self.dec_comb_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                              name="dec_comb_proj")
        self._n_emb = n_emb

    def embed(self, spk_ids: Optional[Array] = None,
              spk_feat: Optional[Array] = None):
        """Return the list of projected, L2-normalized speaker embeddings."""
        embs = []
        if self.use_lookup:
            assert spk_ids is not None
            e = self.spk_lookup(spk_ids)
            e = e / jnp.maximum(
                jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
            embs.append(self.lookup_proj(e))
        if self.use_pretrained:
            assert spk_feat is not None
            e = spk_feat / jnp.maximum(
                jnp.linalg.norm(spk_feat, axis=-1, keepdims=True), 1e-12)
            embs.append(self.pretrained_proj(e))
        return embs

    def combine(self, feat: Array, embs: List[Array], *,
                where: str = "enc") -> Array:
        """Combine speaker embeddings into a (B, T, D) sequence."""
        if self.spk_emb_comb == "add":
            for e in embs:
                feat = feat + e[:, None, :]
            return feat
        parts = [feat] + [jnp.broadcast_to(
            e[:, None, :], (feat.shape[0], feat.shape[1], e.shape[-1]))
            for e in embs]
        cat = jnp.concatenate(parts, axis=-1)
        proj = self.enc_comb_proj if where == "enc" else self.dec_comb_proj
        return proj(cat)

    def __call__(self, feat: Array, spk_ids: Optional[Array] = None,
                 spk_feat: Optional[Array] = None) -> Array:
        return self.combine(feat, self.embed(spk_ids, spk_feat), where="enc")


class Conv1dVarPredictor(nn.Module):
    """FastSpeech2 variance predictor (prenet/var_pred.py:42-240):
    [Conv1d -> ReLU -> LayerNorm -> Dropout] x N -> Linear -> scalar,
    plus an optional duration-gate head and a scalar re-embedding conv.
    """

    conv_dims: Union[int, Sequence[int]] = (256, 256)
    conv_kernel: int = 3
    conv_dropout: Union[float, Sequence[float]] = 0.5
    use_gate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: Array, feat_len: Optional[Array] = None, *,
                 train: bool = False):
        dims = _as_list(self.conv_dims)
        drops = _as_list(self.conv_dropout, len(dims))
        for i, dim in enumerate(dims):
            feat = Conv1dEv(out_channels=dim, kernel_size=self.conv_kernel,
                            padding_mode="same", dtype=self.dtype,
                            name=f"conv_{i}")(feat)
            feat = jax.nn.relu(feat)
            feat = nn.LayerNorm(name=f"layernorm_{i}")(feat)
            feat = nn.Dropout(drops[i], deterministic=not train)(feat)
        scalar = nn.Dense(1, dtype=self.dtype, name="pred_head")(feat)[..., 0]
        gate = None
        if self.use_gate:
            gate = nn.Dense(1, dtype=self.dtype, name="gate_head")(feat)[..., 0]
        return scalar, gate, feat_len


class ScalarEmbedConv(nn.Module):
    """Re-embed a predicted scalar sequence via a Conv1d
    (var_pred.py:185-240, ``emb_pred_scalar``)."""

    out_dim: int
    kernel_size: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, scalar: Array) -> Array:
        return Conv1dEv(out_channels=self.out_dim,
                        kernel_size=self.kernel_size, padding_mode="same",
                        dtype=self.dtype, name="emb_conv")(scalar[..., None])
