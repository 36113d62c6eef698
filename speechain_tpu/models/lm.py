"""Autoregressive transformer language model (task level).

Rebuild of reference ``speechain/model/lm.py:16-359``: CE loss (+ label
smoothing), accuracy metric; test-time perplexity/confidence. Network is
``speechain_tpu.nn.lm.LanguageModelNet``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from speechain_tpu.nn.lm import LanguageModelNet, LMConfig  # noqa: F401
from speechain_tpu.train import criteria

Array = jnp.ndarray


def lm_loss(logits: Array, text: Array, text_len: Array, *,
            label_smoothing: float = 0.0
            ) -> Tuple[Array, Dict[str, Array]]:
    """Training loss: CE over next-token prediction (model/lm.py).

    logits predict text[:, 1:] from text[:, :-1]: the caller feeds the full
    <sos>...<eos> sequence; here we align logits[:, :-1] to text[:, 1:].
    """
    shifted_logits = logits[:, :-1]
    ce = criteria.cross_entropy(shifted_logits, text, text_len,
                                label_smoothing=label_smoothing)
    acc = criteria.accuracy(shifted_logits, text, text_len)
    ppl = criteria.perplexity(shifted_logits, text, text_len)
    metrics = dict(ce_loss=ce, accuracy=acc, text_ppl=ppl, loss=ce)
    return ce, metrics
