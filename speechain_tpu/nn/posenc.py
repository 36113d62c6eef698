"""Positional encodings.

TPU-native rebuild of reference ``module/transformer/pos_enc.py`` and
``module/conformer/pos_enc.py``. The sinusoid table is a compile-time
constant (static ``max_len``) instead of a lazily-resized buffer
(``pos_enc.py:163-165``): under jit, sequence length is static per input
shape bucket, so the table is simply built large enough and sliced.

Parity notes (pos_enc.py:115-190):
- 'mix' interleaves sin/cos; 'sep' puts all sin in the first half and cos
  (with an extended div_term) in the second half.
- div_term uses exp(arange(0, d, 2) * log(10000)/d) as a DIVISOR
  (position / div_term) — note the reference multiplies by +log(10000)/d and
  divides, which equals the canonical formula.
- optional LayerNorm on the embedded feature, optional sqrt(d_model) scale,
  optional trainable scalar alpha on the PE (Transformer-TTS style).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn

from speechain_tpu.nn.norms import FlatDropout
import jax.numpy as jnp
import numpy as np


def sinusoid_table(max_len: int, d_model: int, posenc_type: str = "mix") -> np.ndarray:
    """(max_len, d_model) float32 sinusoid table (pos_enc.py:115-143)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    if posenc_type == "mix":
        pe[:, 0::2] = np.sin(position / div_term)
        pe[:, 1::2] = np.cos(position / div_term)
    elif posenc_type == "sep":
        div_term_ext = np.exp(
            np.arange(d_model, d_model * 2, 2, dtype=np.float64)
            * (math.log(10000.0) / d_model)
        )
        half = d_model // 2
        pe[:, :half] = np.sin(position / div_term)
        pe[:, half:] = np.cos(position / div_term_ext)
    else:
        raise ValueError(f"unknown posenc_type {posenc_type!r}")
    return pe.astype(np.float32)


class PositionalEncoding(nn.Module):
    """Add sinusoidal positional encoding to an embedded sequence.

    Attributes mirror the reference constructor (pos_enc.py:16-108):
      posenc_type: 'mix' | 'sep'
      emb_layernorm: LayerNorm the embeddings first
      emb_scale: multiply embeddings by sqrt(d_model)
      posenc_scale: learnable scalar alpha multiplying the PE
      init_alpha: initial value of alpha
    """

    d_model: int
    posenc_type: str = "mix"
    emb_layernorm: bool = False
    emb_scale: bool = True
    posenc_scale: bool = False
    init_alpha: float = 1.0
    dropout: float = 0.0
    max_len: int = 5000

    @nn.compact
    def __call__(self, emb_feat: jnp.ndarray, *, train: bool = False,
                 offset: int | jnp.ndarray = 0) -> jnp.ndarray:
        table = jnp.asarray(sinusoid_table(self.max_len, self.d_model,
                                           self.posenc_type))
        if self.emb_layernorm:
            emb_feat = nn.LayerNorm(name="emb_layernorm")(emb_feat)
        if self.emb_scale:
            emb_feat = emb_feat * math.sqrt(self.d_model)
        seq_len = emb_feat.shape[1]
        if isinstance(offset, int) and offset == 0:
            pe = table[None, :seq_len]
        elif isinstance(offset, jnp.ndarray) and offset.ndim == 1:
            # per-row decode offsets (continuous-batching stream pool):
            # row b's frames sit at absolute positions offset[b] + j
            pe = jnp.take(table,
                          offset[:, None] + jnp.arange(seq_len)[None, :],
                          axis=0)
        else:
            # single-step decode: gather the PE row(s) at the given offset
            pe = jnp.take(table, offset + jnp.arange(seq_len), axis=0)[None]
        if self.posenc_scale:
            alpha = self.param("alpha", lambda _: jnp.asarray(self.init_alpha))
            pe = pe * alpha
        out = emb_feat + pe.astype(emb_feat.dtype)
        if self.dropout > 0.0:
            out = FlatDropout(self.dropout, deterministic=not train)(out)
        return out


class RelPositionalEncoding(nn.Module):
    """Transformer-XL style bidirectional relative PE (conformer/pos_enc.py:8).

    Returns (dropped(x * xscale), dropped(pos_emb)) where pos_emb covers
    relative positions [L-1 ... -(L-1)], length 2L-1.
    """

    d_model: int
    dropout: float = 0.0
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 decode_cap: int = 0):
        """``decode_cap > 0``: cached/streaming decode — instead of the
        bidirectional [L-1 .. -(L-1)] band, return pos_emb rows for the
        NON-NEGATIVE relative distances [decode_cap-1 .. 0] (a causal
        query only looks back); row r holds distance decode_cap-1-r, the
        same sinusoid values the offline band assigns that distance, so
        chunked decode scores match offline exactly."""
        # build a 2*max_len-1 table: rows are positions +max..-max
        pos = np.arange(self.max_len - 1, -self.max_len, -1, dtype=np.float64)[:, None]
        div_term = np.exp(
            np.arange(0, self.d_model, 2, dtype=np.float64)
            * -(math.log(10000.0) / self.d_model)
        )
        table = np.zeros((2 * self.max_len - 1, self.d_model), dtype=np.float64)
        table[:, 0::2] = np.sin(pos * div_term)
        table[:, 1::2] = np.cos(pos * div_term)
        table = jnp.asarray(table.astype(np.float32))

        x = x * math.sqrt(self.d_model)
        center = self.max_len - 1
        if decode_cap:
            if decode_cap > self.max_len:
                raise ValueError(
                    f"decode_cap={decode_cap} exceeds posenc max_len="
                    f"{self.max_len}")
            pos_emb = table[None, center - (decode_cap - 1): center + 1]
        else:
            L = x.shape[1]
            pos_emb = table[None, center - (L - 1): center + L]
        drop = FlatDropout(self.dropout, deterministic=not train)
        return drop(x), drop(pos_emb.astype(x.dtype))
