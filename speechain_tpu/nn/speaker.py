"""Speaker encoders: ECAPA-TDNN and x-vector (192-d embeddings).

Rebuild of reference ``module/encoder/speaker.py:7-116`` in flax.
Inference-only: used for offline speaker-feature extraction
(utilbox/spk_util.py:18 driver) and speaker-similarity evaluation
(recipes/tts/spk_sim_evaluation.py:43). Input is (B, T, n_mels) log-mel;
output L2-normalized (B, 192).

All convs channels-last; BatchNorm in inference (running-average) mode —
local checkpoints supply the statistics; random init is only for shape
tests, exactly like the reference's in-repo copies.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class SEModule(nn.Module):
    """Squeeze-and-excitation over the channel axis (speaker.py:7-19)."""

    channels: int
    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=1, keepdims=True)            # (B, 1, C)
        s = nn.Conv(self.bottleneck, (1,), name="se_fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.channels, (1,), name="se_fc2")(s)
        return x * jax.nn.sigmoid(s)


class Res2Block(nn.Module):
    """Res2Net split-conv block (speaker.py:22-44)."""

    channels: int
    kernel_size: int = 3
    scale: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        width = self.channels // self.scale
        splits = [x[..., i * width:(i + 1) * width]
                  for i in range(self.scale)]
        out = splits[0]
        outputs = [out]
        for i in range(self.scale - 1):
            out = jax.nn.relu(out)
            out = nn.Conv(width, (self.kernel_size,), padding="SAME",
                          name=f"conv_{i}")(out)
            outputs.append(out)
        return x + jnp.concatenate(outputs[: self.scale], axis=-1)


class EncoderClassifier(nn.Module):
    """ECAPA / x-vector encoder (speaker.py:46-110)."""

    model_type: str = "ecapa"

    @nn.compact
    def __call__(self, feat: Array,
                 feat_len: Optional[Array] = None) -> Array:
        def masked_mean(x):
            if feat_len is None:
                return jnp.mean(x, axis=1)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1), 1)
            valid = (pos < feat_len[:, None, None]).astype(x.dtype)
            return (jnp.sum(x * valid, 1)
                    / jnp.maximum(jnp.sum(valid, 1), 1.0))

        bn = lambda name: nn.BatchNorm(use_running_average=True, name=name)
        if self.model_type == "ecapa":
            ch = 512
            x = nn.Conv(ch, (7,), padding="SAME", name="conv1")(feat)
            x = bn("bn1")(x)
            x = jax.nn.relu(x)
            x = Res2Block(channels=ch, name="res2block")(x)
            x = SEModule(channels=ch, name="se")(x)
            x = bn("bn2")(x)
            x = masked_mean(x)
            emb = nn.Dense(192, name="fc")(x)
        elif self.model_type == "xvector":
            x = feat
            for i, k in enumerate((5, 3, 3)):
                x = nn.Conv(512, (k,), padding="SAME", name=f"tdnn{i}")(x)
                x = bn(f"bn{i}")(x)
                x = jax.nn.relu(x)
            x = masked_mean(x)
            x = jax.nn.relu(nn.Dense(512, name="fc1")(x))
            emb = nn.Dense(192, name="fc2")(x)
        else:
            raise ValueError(self.model_type)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


def extract_spk_feat(model_type: str, variables, feat: Array,
                     feat_len: Optional[Array] = None) -> Array:
    """Batch speaker embedding extraction (utilbox/spk_util.py:18)."""
    model = EncoderClassifier(model_type=model_type)
    return model.apply(variables, feat, feat_len)


def speaker_cosine_similarity(emb_a: Array, emb_b: Array) -> Array:
    """Cosine similarity of L2-normalized embeddings
    (spk_sim_evaluation.py:43)."""
    return jnp.sum(emb_a * emb_b, axis=-1)
