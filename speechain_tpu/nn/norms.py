"""LayerNorm module routing through the fused Pallas kernel on TPU.

Drop-in for ``flax.linen.LayerNorm`` with an IDENTICAL param tree
("scale"/"bias" under the module name), so checkpoints are interchangeable.
On non-TPU backends (or with SPEECHAIN_DISABLE_FUSED_LN /
SPEECHAIN_DISABLE_PALLAS set) it computes the exact flax formula in XLA.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speechain_tpu.ops.pallas_layernorm import (fused_layer_norm,
                                                fused_ln_enabled)

Array = jnp.ndarray


class FlatDropout(nn.Module):
    """``nn.Dropout`` with the mask drawn on a rank-2 flattening.

    XLA TPU's rng-bit-generator prefers the batch-in-sublanes {2,0,1}
    layout for rank-3 outputs, so a dropout on (B, T, D) drags the
    surrounding residual-add fusion into {2,0,1} and XLA inserts a full
    (B, T, D) relayout copy at the next row-major Pallas-kernel hand-off
    (75 copies ~= 3.2 ms/step in the round-4 step trace). Drawing the
    mask at (B*T, D) keeps the whole chain in the matmul layout; the
    reshapes are bitcasts. Identical distribution, different (but still
    per-call deterministic) bit assignment."""

    rate: float
    deterministic: bool

    @nn.compact
    def __call__(self, x):
        if x.ndim != 3 or self.rate <= 0.0 or self.deterministic:
            return nn.Dropout(self.rate,
                              deterministic=self.deterministic)(x)
        B, T, D = x.shape
        return nn.Dropout(self.rate, deterministic=False)(
            x.reshape(B * T, D)).reshape(B, T, D)


class LayerNorm(nn.Module):
    """See module docstring."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import jax

        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        n = 1
        for d in x.shape[:-1]:
            n *= d
        if fused_ln_enabled() and n % 8 == 0 and D % 128 == 0:
            return fused_layer_norm(x, scale, bias, self.epsilon)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)
