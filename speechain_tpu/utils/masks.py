"""Length/causal mask helpers (device-side, jit-friendly).

Mirrors the semantics of reference ``utilbox/train_util.py:31``
(make_mask_from_len) and ``module/transformer/decoder.py:292``
(subsequent_mask), expressed with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def make_mask_from_len(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(batch,) int lengths -> (batch, 1, max_len) bool mask, True = valid."""
    pos = lax.broadcasted_iota(jnp.int32, (1, 1, max_len), 2)
    return pos < lengths.astype(jnp.int32)[:, None, None]


def subsequent_mask(size: int) -> jnp.ndarray:
    """(1, size, size) lower-triangular causal mask, True = attendable."""
    row = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return (col <= row)[None]


def combine_masks(*masks):
    """AND of broadcastable boolean masks, ignoring Nones."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_and(out, m)
    return out


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean attention mask -> additive bias (0 where True, big-neg where False)."""
    big_neg = jnp.asarray(-1e9 if dtype == jnp.float32 else -1e4, dtype)
    return jnp.where(mask, jnp.asarray(0, dtype), big_neg)
