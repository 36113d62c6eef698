"""Conformer encoder.

Rebuild of reference ``module/conformer/encoder.py`` (macaron
FFN-1/2 + rel-pos MHA + convolution module + FFN-1/2, each residual with its
own LayerNorm, pre/post-LN selectable) and ``module/conformer/pos_enc.py``.

Parity notes:
- Convolution module (encoder.py:14-65): pointwise conv -> GLU -> depthwise
  'same' conv -> BatchNorm -> swish -> pointwise conv. BatchNorm statistics
  include padded frames, exactly like the reference's BatchNorm1d — masked
  statistics would change numerics.
- Macaron FFN halves: 0.5 * dropout(ffn(x)) + x (encoder.py:141-142).
- The rel-pos MHA uses the shared non-standard 1/sqrt(d_model) scaling.

TPU notes: BatchNorm running stats live in the 'batch_stats' collection and
are synchronized across the data mesh via ``axis_name`` when training under
shard_map/pjit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechain_tpu.nn.norms import FlatDropout, LayerNorm, bn_norm
from speechain_tpu.nn.attention import RelPosMultiHeadedAttention
from speechain_tpu.nn.feed_forward import PositionwiseFeedForward
from speechain_tpu.nn.posenc import RelPositionalEncoding

Array = jnp.ndarray


class DepthwiseConv1d(nn.Module):
    """Depthwise 'SAME' conv as an unrolled shift-multiply-accumulate.

    Deliberately NOT ``nn.Conv(feature_group_count=C)``: the XLA SPMD
    partitioner produces a wrong (not merely reordered) gradient for the
    grouped-convolution kernel on meshes with a model axis (observed on a
    4x2 dp x tp mesh: rel-error 1.0 vs single device, dp-only exact). The
    shifted-fma form is also the better TPU mapping — depthwise conv has no
    MXU-sized contraction; this lowers to VPU fmas that fuse with the
    surrounding BatchNorm/GLU. Param shapes match nn.Conv ((K, 1, C) kernel,
    (C,) bias) so checkpoints are interchangeable.
    """

    channels: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        K, C = self.kernel_size, self.channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (K, 1, C), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        T = x.shape[1]
        if self.causal:
            pad_lo, pad_hi = K - 1, 0      # left-only: frame t sees <= t
        else:
            pad_lo, pad_hi = (K - 1) // 2, K // 2      # XLA SAME padding
        xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
        w = kernel[:, 0, :].astype(self.dtype)
        out = xp[:, 0:T, :] * w[0]
        for k in range(1, K):
            out = out + xp[:, k:k + T, :] * w[k]
        return out + bias.astype(self.dtype)


def _convmod_fused_ok(x, channels: int) -> bool:
    from speechain_tpu.ops.pallas_convmod import fused_convmod_enabled
    return (fused_convmod_enabled() and x.ndim == 3 and
            x.shape[-1] == channels and channels % 128 == 0)


class _ConvPointwiseParams(nn.Module):
    """nn.Conv-compatible {kernel (1, Cin, Cout), bias} params without the
    conv — consumed directly by the fused conv-module kernel while the
    param tree stays byte-identical to the nn.Conv path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class _PointwiseConv(nn.Module):
    """Kernel-size-1 conv computed as a matmul with nn.Conv-identical
    params. ``nn.Conv(kernel_size=(1,))`` lowers to an XLA convolution
    whose preferred operand layout is batch-minor ({2,0,1}), so every
    hand-off with the matmul-layout ({2,1,0}) Pallas kernels inserted a
    full (B, T, C) relayout copy — 74 copies ≈ 3.2 ms/step in the round-4
    step trace. A dot keeps the matmul layout end to end; same math, same
    fp32 accumulation, identical parameter tree."""

    in_features: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        cd = self.dtype
        y = jax.lax.dot_general(
            x.astype(cd), k[0].astype(cd), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b.astype(jnp.float32)).astype(cd)


class _DWParams(nn.Module):
    """DepthwiseConv1d-compatible {kernel (K, 1, C), bias} params."""

    kernel_size: int
    channels: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel_size, 1, self.channels), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.channels,), jnp.float32)
        return k, b


class _BNApply(nn.Module):
    """flax.linen.BatchNorm-compatible normalization from PRECOMPUTED batch
    moments (the fused conv-module kernel accumulates sum/sum-of-squares
    in-pass). Same param/batch_stats tree ({scale, bias} / {mean, var}),
    same momentum-0.9 running update, same axis_name pmean sync of the
    (mean, mean-of-squares) pair before the variance is formed."""

    channels: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, u: Array, batch_mean: Array, batch_mean2: Array, *,
                 train: bool = False) -> Array:
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
                                 (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = bn_norm(u, mean, var, scale, bias, self.epsilon)
        return y.astype(self.dtype)


class ConvolutionModule(nn.Module):
    channels: int
    depthwise_kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    causal: bool = False

    @nn.compact
    def __call__(self, feat: Array, *, train: bool = False,
                 decode: bool = False, prime: bool = False,
                 decode_advance: Optional[Array] = None,
                 decode_reset: Optional[Array] = None) -> Array:
        """``decode``: streaming chunk mode — the depthwise conv's K-1
        left-context frames (post-GLU) carry across calls in a 'cache'
        variable. Zero-init equals the causal left padding, so chunked
        output is bit-equal to offline causal conv. ``decode_advance``:
        per-row count of VALID frames this chunk (rows are valid-first);
        the context window slides by that amount. None = whole chunk.
        ``decode_reset``: (B,) bool — rows starting a NEW stream in a
        reused slot must drop the previous occupant's context (unlike the
        KV cache, a sliding window is not healed by position overwrite)."""
        if decode:
            if not self.causal:
                raise ValueError("conv-module decode requires causal=True")
            return self._decode(feat, prime=prime, advance=decode_advance,
                                reset=decode_reset)
        # (B, T, C); channels-last throughout (flax conv convention)
        if not self.causal and _convmod_fused_ok(feat, self.channels):
            # one VMEM-resident pass: pointwise matmul + GLU + depthwise
            # + BatchNorm batch moments (ops/pallas_convmod.py); the
            # (B, T, 2C) pointwise output never touches HBM
            from speechain_tpu.ops.pallas_convmod import fused_conv_glu_dw
            C, K = self.channels, self.depthwise_kernel_size
            w1, b1 = _ConvPointwiseParams(C, 2 * C,
                                          name="pointwise_conv1")()
            dwk, dwb = _DWParams(K, C, name="depthwise_conv")()
            u, s, ss = fused_conv_glu_dw(
                feat.astype(self.dtype), w1[0], b1, dwk[:, 0, :], dwb, K)
            n = feat.shape[0] * feat.shape[1]
            x = _BNApply(channels=C, dtype=self.dtype,
                         axis_name=self.bn_axis_name, name="batch_norm")(
                u, s / n, ss / n, train=train)
        else:
            x = _PointwiseConv(self.channels, 2 * self.channels,
                               dtype=self.dtype,
                               name="pointwise_conv1")(feat)
            x = jax.nn.glu(x, axis=-1)
            x = DepthwiseConv1d(channels=self.channels,
                                kernel_size=self.depthwise_kernel_size,
                                dtype=self.dtype, causal=self.causal,
                                name="depthwise_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name,
                             name="batch_norm")(x)
        x = jax.nn.silu(x)
        x = _PointwiseConv(self.channels, self.channels, dtype=self.dtype,
                           name="pointwise_conv2")(x)
        return x

    def _decode(self, feat: Array, *, prime: bool,
                advance: Optional[Array],
                reset: Optional[Array]) -> Array:
        B, T, C = feat.shape
        K = self.depthwise_kernel_size
        ctx = self.variable("cache", "conv_context",
                            jnp.zeros, (B, K - 1, C), self.dtype)
        ctx_val = ctx.value
        if reset is not None:
            ctx_val = jnp.where(
                jnp.asarray(reset).reshape(B, 1, 1), 0.0, ctx_val)
        x = _PointwiseConv(C, 2 * C, dtype=self.dtype,
                           name="pointwise_conv1")(feat)
        xg = jax.nn.glu(x, axis=-1)                       # (B, T, C)
        xcat = jnp.concatenate([ctx_val, xg.astype(self.dtype)], 1)
        # valid (no-pad) depthwise conv over [context | chunk]: output t
        # consumes xcat[t .. t+K-1] == causal window ending at chunk t
        dw = DepthwiseConv1d(channels=C, kernel_size=K, dtype=self.dtype,
                             causal=True, name="depthwise_conv")
        # reuse the module's params but run the valid conv inline: causal
        # DepthwiseConv1d(xcat) computes left-padded outputs for ALL
        # K-1+T positions; rows K-1.. are exactly the valid-window outputs
        x = dw(xcat)[:, K - 1:, :]                        # (B, T, C)
        if not prime:
            # slide the context by this chunk's valid frame count; rows
            # are valid-first, so garbage frames (>= advance) never enter
            if advance is None:
                new_ctx = xcat[:, T:, :]
            else:
                adv = jnp.asarray(advance, jnp.int32)
                adv = jnp.broadcast_to(adv, (B,))
                new_ctx = jax.vmap(
                    lambda xc, a: jax.lax.dynamic_slice(
                        xc, (a, 0), (K - 1, C)))(xcat, adv)
            ctx.value = new_ctx
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name="batch_norm")(x)
        x = jax.nn.silu(x)
        x = _PointwiseConv(C, C, dtype=self.dtype,
                           name="pointwise_conv2")(x)
        return x


class ConformerEncoderLayer(nn.Module):
    d_model: int = 512
    num_heads: int = 8
    att_dropout: float = 0.1
    depthwise_kernel_size: int = 31
    fdfwd_dim: int = 2048
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "ReLU"
    fdfwd_args: Dict[str, Any] = None
    fdfwd_dropout: float = 0.1
    res_dropout: float = 0.1
    layernorm_first: bool = True
    scale_dp_by_head: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    causal: bool = False

    @nn.compact
    def __call__(self, src: Array, mask: Optional[Array], posenc: Array, *,
                 train: bool = False, return_attmat: bool = True,
                 decode: bool = False, decode_index: Optional[Array] = None,
                 cache_capacity: Optional[int] = None, prime: bool = False,
                 decode_advance: Optional[Array] = None,
                 decode_reset: Optional[Array] = None):
        drop = FlatDropout(self.res_dropout, deterministic=not train)
        ffn = lambda name: PositionwiseFeedForward(
            d_model=self.d_model, fdfwd_dim=self.fdfwd_dim,
            fdfwd_type=self.fdfwd_type, fdfwd_activation=self.fdfwd_activation,
            fdfwd_args=self.fdfwd_args, dropout=self.fdfwd_dropout,
            dtype=self.dtype, name=name)
        ln_front = LayerNorm(epsilon=1e-6, name="front_fdfwd_layernorm")
        ln_mha = LayerNorm(epsilon=1e-6, name="mha_layernorm")
        ln_conv = LayerNorm(epsilon=1e-6, name="conv_layernorm")
        ln_rear = LayerNorm(epsilon=1e-6, name="rear_fdfwd_layernorm")

        # front macaron FFN half: 0.5 * drop(ffn(x)) + src
        # (encoder.py:141-142) — residual folded into the fused kernel
        x = ln_front(src) if self.layernorm_first else src
        x = ffn("front_feed_forward")(x, train=train, residual=src,
                                      res_scale=0.5,
                                      res_dropout=self.res_dropout)
        if not self.layernorm_first:
            x = ln_front(x)

        # rel-pos MHA
        y = ln_mha(x) if self.layernorm_first else x
        mha_hidden, attmat = RelPosMultiHeadedAttention(
            d_model=self.d_model, num_heads=self.num_heads,
            dropout=self.att_dropout, scale_dp_by_head=self.scale_dp_by_head,
            dtype=self.dtype, name="relpos_mha",
        )(y, y, y, mask, posenc, train=train, return_attmat=return_attmat,
          decode=decode, decode_index=decode_index,
          cache_capacity=cache_capacity, prime=prime)
        y = drop(mha_hidden) + x
        if not self.layernorm_first:
            y = ln_mha(y)

        # convolution module
        z = ln_conv(y) if self.layernorm_first else y
        z = drop(ConvolutionModule(
            channels=self.d_model,
            depthwise_kernel_size=self.depthwise_kernel_size,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            causal=self.causal,
            name="conv_module")(z, train=train, decode=decode, prime=prime,
                                decode_advance=decode_advance,
                                decode_reset=decode_reset)) + y
        if not self.layernorm_first:
            z = ln_conv(z)

        # rear macaron FFN half
        w = ln_rear(z) if self.layernorm_first else z
        w = ffn("rear_feed_forward")(w, train=train, residual=z,
                                     res_scale=0.5,
                                     res_dropout=self.res_dropout)
        if not self.layernorm_first:
            w = ln_rear(w)
        return w, attmat


class ConformerEncoder(nn.Module):
    """Rel-posenc + N conformer layers (+ final LN in pre-LN mode).

    Returns (output, mask, attmat_list, hidden_list) mirroring
    TransformerEncoder (conformer/encoder.py:213-320).
    """

    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 16
    att_dropout: float = 0.1
    posenc_maxlen: int = 5000
    posenc_dropout: float = 0.1
    depthwise_kernel_size: int = 31
    fdfwd_dim: int = 2048
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "SiLU"
    fdfwd_args: Dict[str, Any] = None
    fdfwd_dropout: float = 0.1
    res_dropout: float = 0.1
    layernorm_first: bool = True
    scale_dp_by_head: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    remat: bool = False
    uni_direction: bool = False

    @nn.compact
    def __call__(self, src: Array, mask: Optional[Array], *,
                 train: bool = False, return_attmat: bool = False,
                 return_hidden: bool = False, decode: bool = False,
                 cache_capacity: Optional[int] = None, prime: bool = False,
                 decode_position: Optional[Array] = None,
                 decode_advance: Optional[Array] = None,
                 decode_reset: Optional[Array] = None):
        """``uni_direction``: causal conformer — subsequent-masked rel-pos
        MHA + left-padded (causal) convolution modules; BatchNorm is
        unchanged (training sees whole utterances; eval uses running
        stats, which stream exactly). ``decode``: chunked KV-cached
        streaming mode mirroring TransformerEncoder — per-layer K/V
        caches + conv left-context caches live in the 'cache' collection,
        positions driven via ``decode_position`` (scalar or per-row),
        ``decode_advance`` = per-row VALID frame count of this chunk."""
        # Rematerialize each layer in the backward pass (jax.checkpoint via
        # nn.remat): trades recompute FLOPs for live-activation HBM — the
        # lever for large-batch working-set spills. Only engages when the
        # caller doesn't need per-layer extras (those would defeat it).
        use_remat = self.remat and not (return_attmat or return_hidden
                                        or decode or prime)
        if decode:
            assert self.uni_direction, "decode mode implies causal encoder"
            if not cache_capacity:
                raise ValueError("decode needs cache_capacity")
            pos_var = self.variable("cache", "position",
                                    lambda: jnp.zeros((), jnp.int32))
            src, posenc = RelPositionalEncoding(
                d_model=self.d_model, dropout=self.posenc_dropout,
                max_len=self.posenc_maxlen, name="posenc",
            )(src, train=train, decode_cap=int(cache_capacity))
            if not prime and decode_position is None:
                decode_position = pos_var.value
                pos_var.value = pos_var.value + src.shape[1]
        else:
            src, posenc = RelPositionalEncoding(
                d_model=self.d_model, dropout=self.posenc_dropout,
                max_len=self.posenc_maxlen, name="posenc",
            )(src, train=train)
        if self.uni_direction and not decode:
            # materialize the causal band into the mask (the rel-pos MHA
            # applies masks directly; no flag path like the std MHA)
            from speechain_tpu.utils.masks import subsequent_mask
            cm = subsequent_mask(src.shape[1])
            mask = cm if mask is None else (mask & cm)

        attmats, hiddens = [], []
        for i in range(self.num_layers):
            layer = ConformerEncoderLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                att_dropout=self.att_dropout,
                depthwise_kernel_size=self.depthwise_kernel_size,
                fdfwd_dim=self.fdfwd_dim, fdfwd_type=self.fdfwd_type,
                fdfwd_activation=self.fdfwd_activation,
                fdfwd_args=self.fdfwd_args,
                fdfwd_dropout=self.fdfwd_dropout,
                res_dropout=self.res_dropout,
                layernorm_first=self.layernorm_first,
                scale_dp_by_head=self.scale_dp_by_head, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, causal=self.uni_direction,
                name=f"layer_{i}",
            )
            if use_remat:
                src = nn.remat(
                    lambda mdl, s, m, p: mdl(
                        s, m, p, train=train, return_attmat=False)[0],
                )(layer, src, mask, posenc)
                attmat = None
            else:
                src, attmat = layer(
                    src, mask if not decode else None, posenc, train=train,
                    return_attmat=return_attmat, decode=decode,
                    decode_index=decode_position if decode else None,
                    cache_capacity=cache_capacity, prime=prime,
                    decode_advance=decode_advance,
                    decode_reset=decode_reset)
            if return_attmat:
                attmats.append(attmat)
            if return_hidden:
                hiddens.append(src)

        if self.layernorm_first:
            src = LayerNorm(epsilon=1e-6, name="layernorm")(src)
        return src, mask, attmats, hiddens
