"""Standalone autoregressive language model.

Rebuild of reference ``module/standalone/lm.py:12-102``: token embedding ->
unidirectional TransformerEncoder -> TokenPostnet. Used for LM training and
for ASR-LM joint decoding (with a KV-cached ``decode_step`` the reference
lacks — it re-runs the full prefix per beam step, beam_search.py:321-339).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from speechain_tpu.nn.postnets import TokenPostnet
from speechain_tpu.nn.prenets import EmbedPrenet
from speechain_tpu.nn.transformer import TransformerEncoder
from speechain_tpu.utils.masks import make_mask_from_len

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int
    emb: Dict[str, Any] = dataclasses.field(default_factory=dict)
    encoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    dtype: Any = jnp.float32


class LanguageModelNet(nn.Module):
    cfg: LMConfig

    def setup(self):
        c = self.cfg
        self.embedding = EmbedPrenet(vocab_size=c.vocab_size, dtype=c.dtype,
                                     name="embedding", **c.emb)
        enc_conf = dict(c.encoder)
        enc_conf["uni_direction"] = True
        self.encoder = TransformerEncoder(dtype=c.dtype, name="encoder",
                                          **enc_conf)
        self.postnet = TokenPostnet(vocab_size=c.vocab_size, dtype=c.dtype,
                                    name="postnet")

    def __call__(self, text: Array, text_len: Array, *, train: bool = False,
                 return_attmat: bool = False):
        emb = self.embedding(text)
        mask = make_mask_from_len(text_len, text.shape[1])
        enc_feat, enc_mask, attmats, _ = self.encoder(
            emb, mask, train=train, return_attmat=return_attmat)
        return self.postnet(enc_feat), enc_mask, attmats

    def decode_step(self, token: Array, *, prime: bool = False,
                    cache_capacity: Optional[int] = None):
        """Single-step KV-cached LM scoring for beam-search fusion."""
        emb = self.embedding(token)
        enc_feat, *_ = self.encoder(emb, None, decode=True, prime=prime,
                                    cache_capacity=cache_capacity)
        return self.postnet(enc_feat)
