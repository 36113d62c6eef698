"""Transformer encoder and decoder stacks.

Rebuild of reference ``module/transformer/encoder.py`` and ``decoder.py``.
Semantics preserved:

- pre-LN (``layernorm_first=True``, default) vs post-LN residual pattern
  (encoder.py:66-72); a final LayerNorm is applied in pre-LN mode.
- residual dropout applied to sublayer outputs before adding the input.
- per-layer attention matrices and hidden states are returned (for
  visualization and attention-guidance losses, encoder.py:338-344).
- ``uni_direction=True`` ANDs a causal mask into the encoder self-attention
  so the same stack doubles as the LM backbone (encoder.py:330-336).

TPU-native deltas: layers scanned-over? No — per-layer attmat/hidden returns
and small layer counts (<=16) make a Python loop the right choice (XLA
unrolls and fuses); decoding uses KV caches (see attention.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from speechain_tpu.nn.norms import FlatDropout, LayerNorm
from speechain_tpu.nn.attention import MultiHeadedAttention
from speechain_tpu.nn.feed_forward import PositionwiseFeedForward
from speechain_tpu.nn.posenc import PositionalEncoding
from speechain_tpu.utils.masks import subsequent_mask

Array = jnp.ndarray


class TransformerEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    scale_dp_by_head: bool = False
    att_dropout: float = 0.1
    fdfwd_dim: int = 2048
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "ReLU"
    fdfwd_args: Dict[str, Any] = None
    fdfwd_dropout: float = 0.1
    res_dropout: float = 0.1
    layernorm_first: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: Array, mask: Optional[Array], *,
                 train: bool = False, return_attmat: bool = True,
                 decode: bool = False, cache_capacity: Optional[int] = None,
                 prime: bool = False, causal: bool = False,
                 decode_index: Optional[Array] = None):
        ln_att = LayerNorm(epsilon=1e-6, name="att_layernorm")
        ln_ff = LayerNorm(epsilon=1e-6, name="fdfwd_layernorm")
        drop = FlatDropout(self.res_dropout, deterministic=not train)

        x = ln_att(src) if self.layernorm_first else src
        att_hidden, attmat = MultiHeadedAttention(
            d_model=self.d_model, num_heads=self.num_heads,
            dropout=self.att_dropout, scale_dp_by_head=self.scale_dp_by_head,
            dtype=self.dtype, name="multihead_att",
        )(x, x, x, mask, train=train, return_attmat=return_attmat,
          decode=decode, cache_capacity=cache_capacity, prime=prime,
          causal=causal, decode_index=decode_index)
        att_out = drop(att_hidden) + src
        if not self.layernorm_first:
            att_out = ln_att(att_out)

        y = ln_ff(att_out) if self.layernorm_first else att_out
        if self.fdfwd_type == "moe":
            # Switch mixture-of-experts FFN (nn/moe.py, beyond-parity);
            # fdfwd_args carries num_experts / capacity_factor / ...
            from speechain_tpu.nn.moe import SwitchFFN
            ff_hidden = SwitchFFN(
                d_model=self.d_model, fdfwd_dim=self.fdfwd_dim,
                fdfwd_activation=self.fdfwd_activation,
                dropout=self.fdfwd_dropout, dtype=self.dtype,
                name="feed_forward", **(self.fdfwd_args or {}),
            )(y, train=train)
            out = drop(ff_hidden) + att_out
        else:
            # residual + res-dropout fold into the fused FFN kernel's
            # epilogue on TPU (ops/pallas_ffn.py::fused_ffn_residual)
            out = PositionwiseFeedForward(
                d_model=self.d_model, fdfwd_dim=self.fdfwd_dim,
                fdfwd_type=self.fdfwd_type,
                fdfwd_activation=self.fdfwd_activation,
                fdfwd_args=self.fdfwd_args, dropout=self.fdfwd_dropout,
                dtype=self.dtype, name="feed_forward",
            )(y, train=train, residual=att_out,
              res_dropout=self.res_dropout)
        if not self.layernorm_first:
            out = ln_ff(out)
        return out, attmat


class TransformerEncoder(nn.Module):
    """Posenc + N encoder layers (+ final LN in pre-LN mode).

    Returns (output, mask, attmat_list, hidden_list) like encoder.py:310-349.
    """

    d_model: int = 512
    num_heads: int = 4
    num_layers: int = 8
    scale_dp_by_head: bool = False
    att_dropout: float = 0.1
    posenc_type: str = "mix"
    posenc_maxlen: int = 5000
    posenc_dropout: float = 0.1
    posenc_scale: bool = False
    posenc_init_alpha: float = 1.0
    emb_layernorm: bool = False
    emb_scale: bool = True
    fdfwd_dim: int = 2048
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "ReLU"
    fdfwd_args: Dict[str, Any] = None
    fdfwd_dropout: float = 0.1
    res_dropout: float = 0.1
    uni_direction: bool = False
    layernorm_first: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, src: Array, mask: Optional[Array], *,
                 train: bool = False, return_attmat: bool = False,
                 return_hidden: bool = False, decode: bool = False,
                 cache_capacity: Optional[int] = None, prime: bool = False,
                 decode_position: Optional[Array] = None,
                 decode_advance: Optional[Array] = None,
                 decode_reset: Optional[Array] = None):
        # decode_advance/decode_reset: accepted for interface parity with
        # ConformerEncoder (whose conv caches slide by the valid count and
        # reset on slot reuse); the KV cache needs only positions — stale
        # rows are healed by position overwrite — so both are unused here
        del decode_advance, decode_reset
        posenc = PositionalEncoding(
            d_model=self.d_model, posenc_type=self.posenc_type,
            emb_layernorm=self.emb_layernorm, emb_scale=self.emb_scale,
            posenc_scale=self.posenc_scale, init_alpha=self.posenc_init_alpha,
            dropout=self.posenc_dropout, max_len=self.posenc_maxlen,
            name="posenc",
        )
        if decode:
            # cached mode (LM decoding in beam search, streaming ASR
            # encoder): position tracked in the cache collection like
            # TransformerDecoder, or driven externally via decode_position
            # (streaming passes a chunk of rows but advances only by the
            # VALID row count, so it owns the position)
            assert self.uni_direction, "decode mode implies causal encoder"
            pos_var = self.variable("cache", "position",
                                    lambda: jnp.zeros((), jnp.int32))
            if prime:
                src = posenc(src, train=train)
            else:
                pos_idx = (pos_var.value if decode_position is None
                           else decode_position)
                src = posenc(src, train=train, offset=pos_idx)
                if decode_position is None:
                    pos_var.value = pos_var.value + src.shape[1]
        else:
            src = posenc(src, train=train)

        # uni_direction: the causal constraint is passed as a FLAG (the
        # attention module ANDs a subsequent mask in its XLA path) rather
        # than materialized into (B, L, L) here — a (B, 1, L) length mask +
        # flag keeps the layers eligible for the fused Pallas attention
        causal = bool(self.uni_direction and not decode)

        # see ConformerEncoder.remat — backward-pass rematerialization;
        # per-layer extras or cached decode modes opt out
        use_remat = self.remat and not (return_attmat or return_hidden
                                        or decode or prime)
        attmats, hiddens = [], []
        for i in range(self.num_layers):
            layer = TransformerEncoderLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                scale_dp_by_head=self.scale_dp_by_head,
                att_dropout=self.att_dropout, fdfwd_dim=self.fdfwd_dim,
                fdfwd_type=self.fdfwd_type,
                fdfwd_activation=self.fdfwd_activation,
                fdfwd_args=self.fdfwd_args, fdfwd_dropout=self.fdfwd_dropout,
                res_dropout=self.res_dropout,
                layernorm_first=self.layernorm_first, dtype=self.dtype,
                name=f"layer_{i}",
            )
            if use_remat:
                src = nn.remat(
                    lambda mdl, s, m: mdl(
                        s, m, train=train, return_attmat=False,
                        causal=causal)[0],
                )(layer, src, mask)
                attmat = None
            else:
                src, attmat = layer(
                    src, mask if not decode else None, train=train,
                    return_attmat=return_attmat, decode=decode,
                    cache_capacity=cache_capacity, prime=prime, causal=causal,
                    decode_index=decode_position if decode else None)
            if return_attmat:
                attmats.append(attmat)
            if return_hidden:
                hiddens.append(src)

        if causal:
            # callers receive the combined mask, as before
            L = src.shape[1]
            cm = subsequent_mask(L)  # (1, L, L)
            mask = cm if mask is None else (mask & cm)
        if self.layernorm_first:
            src = LayerNorm(epsilon=1e-6, name="layernorm")(src)
        return src, mask, attmats, hiddens


class TransformerDecoderLayer(nn.Module):
    """Self-att (causal) + cross-att + FFN (decoder.py:16-176)."""

    d_model: int
    num_heads: int
    scale_dp_by_head: bool = False
    att_dropout: float = 0.1
    fdfwd_dim: int = 2048
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "ReLU"
    fdfwd_args: Dict[str, Any] = None
    fdfwd_dropout: float = 0.1
    res_dropout: float = 0.1
    layernorm_first: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, enc_feat: Optional[Array],
                 tgt_mask: Optional[Array], src_mask: Optional[Array], *,
                 train: bool = False, decode: bool = False,
                 cache_capacity: Optional[int] = None, prime: bool = False,
                 return_attmat: bool = True, causal: bool = False):
        ln_self = LayerNorm(epsilon=1e-6, name="self_att_layernorm")
        ln_cross = LayerNorm(epsilon=1e-6, name="cross_att_layernorm")
        ln_ff = LayerNorm(epsilon=1e-6, name="fdfwd_layernorm")
        drop = FlatDropout(self.res_dropout, deterministic=not train)

        x = ln_self(tgt) if self.layernorm_first else tgt
        self_hidden, self_attmat = MultiHeadedAttention(
            d_model=self.d_model, num_heads=self.num_heads,
            dropout=self.att_dropout, scale_dp_by_head=self.scale_dp_by_head,
            dtype=self.dtype, name="self_att",
        )(x, x, x, tgt_mask, train=train, decode=decode,
          cache_capacity=cache_capacity, prime=prime,
          return_attmat=return_attmat, causal=causal)
        self_out = drop(self_hidden) + tgt
        if not self.layernorm_first:
            self_out = ln_self(self_out)

        y = ln_cross(self_out) if self.layernorm_first else self_out
        cross_cache = None
        if decode:
            cross_cache = "write" if prime else "read"
        cross_hidden, cross_attmat = MultiHeadedAttention(
            d_model=self.d_model, num_heads=self.num_heads,
            dropout=self.att_dropout, scale_dp_by_head=self.scale_dp_by_head,
            dtype=self.dtype, name="cross_att",
        )(y, enc_feat, enc_feat, src_mask, train=train,
          cross_cache=cross_cache, return_attmat=return_attmat)
        cross_out = drop(cross_hidden) + self_out
        if not self.layernorm_first:
            cross_out = ln_cross(cross_out)

        z = ln_ff(cross_out) if self.layernorm_first else cross_out
        out = PositionwiseFeedForward(
            d_model=self.d_model, fdfwd_dim=self.fdfwd_dim,
            fdfwd_type=self.fdfwd_type, fdfwd_activation=self.fdfwd_activation,
            fdfwd_args=self.fdfwd_args, dropout=self.fdfwd_dropout,
            dtype=self.dtype, name="feed_forward",
        )(z, train=train, residual=cross_out, res_dropout=self.res_dropout)
        if not self.layernorm_first:
            out = ln_ff(out)
        return out, self_attmat, cross_attmat


class TransformerDecoder(nn.Module):
    """Posenc + N decoder layers (+ final LN in pre-LN mode).

    Training: ``__call__(tgt_emb, enc_feat, tgt_mask, src_mask)`` with
    tgt_mask (B, 1, L) length mask — the causal mask is ANDed in here
    (decoder.py:258-265). Returns (out, self_attmats, cross_attmats, hiddens).

    Decoding: pass ``decode=True`` with a single-step tgt_emb and the 'cache'
    collection mutable; positions are tracked in the cache. Prime the cache
    once with ``prime=True, cache_capacity=max_len`` over the encoder output.
    """

    d_model: int = 512
    num_heads: int = 4
    num_layers: int = 8
    scale_dp_by_head: bool = False
    att_dropout: float = 0.1
    posenc_type: str = "mix"
    posenc_maxlen: int = 5000
    posenc_dropout: float = 0.1
    posenc_scale: bool = False
    posenc_init_alpha: float = 1.0
    emb_layernorm: bool = False
    emb_scale: bool = True
    fdfwd_dim: int = 2048
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "ReLU"
    fdfwd_args: Dict[str, Any] = None
    fdfwd_dropout: float = 0.1
    res_dropout: float = 0.1
    layernorm_first: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, tgt: Array, enc_feat: Optional[Array],
                 tgt_mask: Optional[Array], src_mask: Optional[Array], *,
                 train: bool = False, decode: bool = False,
                 cache_capacity: Optional[int] = None, prime: bool = False,
                 decode_position: Optional[Array] = None,
                 return_attmat: bool = False, return_hidden: bool = False):
        posenc = PositionalEncoding(
            d_model=self.d_model, posenc_type=self.posenc_type,
            emb_layernorm=self.emb_layernorm, emb_scale=self.emb_scale,
            posenc_scale=self.posenc_scale, init_alpha=self.posenc_init_alpha,
            dropout=self.posenc_dropout, max_len=self.posenc_maxlen,
            name="posenc",
        )
        if decode:
            pos_var = self.variable("cache", "position",
                                    lambda: jnp.zeros((), jnp.int32))
            if prime:
                tgt = posenc(tgt, train=train)
            else:
                pos_idx = (pos_var.value if decode_position is None
                           else decode_position)
                tgt = posenc(tgt, train=train, offset=pos_idx)
                if decode_position is None:
                    pos_var.value = pos_var.value + tgt.shape[1]
        else:
            tgt = posenc(tgt, train=train)

        # training: the causal constraint travels as a FLAG with the
        # (B, 1, L) length mask instead of a pre-materialized
        # (B, L, L) combined mask — the flag form keeps the self-attention
        # eligible for the fused Pallas kernel (ops/pallas_attention.py,
        # causal handled in-kernel); the XLA fallback ANDs the subsequent
        # mask inside MultiHeadedAttention, so semantics are identical to
        # the reference's combined mask (decoder.py:258-265)
        causal = not decode

        # see ConformerEncoder.remat — backward-pass rematerialization
        use_remat = self.remat and not (return_attmat or return_hidden
                                        or decode or prime)
        self_attmats, cross_attmats, hiddens = [], [], []
        for i in range(self.num_layers):
            layer = TransformerDecoderLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                scale_dp_by_head=self.scale_dp_by_head,
                att_dropout=self.att_dropout, fdfwd_dim=self.fdfwd_dim,
                fdfwd_type=self.fdfwd_type,
                fdfwd_activation=self.fdfwd_activation,
                fdfwd_args=self.fdfwd_args, fdfwd_dropout=self.fdfwd_dropout,
                res_dropout=self.res_dropout,
                layernorm_first=self.layernorm_first, dtype=self.dtype,
                name=f"layer_{i}",
            )
            if use_remat:
                tgt = nn.remat(
                    lambda mdl, t, ef, tm, sm: mdl(
                        t, ef, tm, sm, train=train, return_attmat=False,
                        causal=causal)[0],
                )(layer, tgt, enc_feat, tgt_mask, src_mask)
                sa = ca = None
            else:
                tgt, sa, ca = layer(
                    tgt, enc_feat, tgt_mask, src_mask, train=train,
                    decode=decode, cache_capacity=cache_capacity, prime=prime,
                    return_attmat=return_attmat, causal=causal)
            if return_attmat:
                self_attmats.append(sa)
                cross_attmats.append(ca)
            if return_hidden:
                hiddens.append(tgt)

        if self.layernorm_first:
            tgt = LayerNorm(epsilon=1e-6, name="layernorm")(tgt)
        return tgt, self_attmats, cross_attmats, hiddens
