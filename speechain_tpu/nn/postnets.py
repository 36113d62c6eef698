"""Postnet modules.

Rebuild of reference ``module/postnet/token.py`` (Linear -> vocab logits;
the ASR decoder head, CTC head, and LM head) and ``module/postnet/conv1d.py``
(Tacotron2-style 5xConv1d residual mel postnet).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn

from speechain_tpu.nn.norms import FastBatchNorm
import jax.numpy as jnp

from speechain_tpu.nn.feed_forward import get_activation
from speechain_tpu.nn.prenets import Conv1dEv, _as_list

Array = jnp.ndarray


class TokenPostnet(nn.Module):
    """Linear projection to vocabulary logits (postnet/token.py:12-48)."""

    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: Array) -> Array:
        from speechain_tpu.nn.attention import _dense_flat
        return _dense_flat(
            nn.Dense(self.vocab_size, dtype=self.dtype, name="linear"), feat)


class Conv1dPostnet(nn.Module):
    """Tacotron2-style conv postnet predicting a residual mel refinement
    (postnet/conv1d.py:15-166): [Conv1d -> BatchNorm -> Tanh -> Dropout] x
    (N-1) -> Conv1d(feat_dim) -> BatchNorm -> Dropout. The caller adds the
    output to the coarse prediction.
    """

    feat_dim: int
    conv_dims: Union[int, Sequence[int]] = (512, 512, 512, 512, 512)
    conv_kernel: int = 5
    conv_batchnorm: bool = True
    conv_activation: str = "Tanh"
    conv_dropout: Union[float, Sequence[float]] = 0.5
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feat: Array, *, train: bool = False) -> Array:
        dims = list(_as_list(self.conv_dims)) + [self.feat_dim]
        drops = _as_list(self.conv_dropout, len(dims))
        x = feat
        for i, dim in enumerate(dims):
            x = Conv1dEv(out_channels=dim, kernel_size=self.conv_kernel,
                         padding_mode="same",
                         use_bias=not self.conv_batchnorm,
                         dtype=self.dtype, name=f"conv_{i}")(x)
            if self.conv_batchnorm:
                x = FastBatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 axis_name=self.bn_axis_name,
                                 name=f"batchnorm_{i}")(x)
            if i < len(dims) - 1 and self.conv_activation is not None:
                x = get_activation(self.conv_activation)(x)
            x = nn.Dropout(drops[i], deterministic=not train)(x)
        return x
