"""Delta / delta-delta features.

Rebuild of reference ``module/frontend/delta_feat.py:12-100``: regression
deltas over a +/-N window (weights k / (2*sum(i^2))), concatenated onto the
static features. Zero padding at the edges like the reference's Conv2d.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def delta_filter(delta_N: int = 2) -> np.ndarray:
    k = np.arange(-delta_N, delta_N + 1, dtype=np.float64)
    return (k / (2.0 * sum(i ** 2 for i in range(1, delta_N + 1)))
            ).astype(np.float32)


@partial(jax.jit, static_argnames=("delta_order", "delta_N"))
def add_delta_features(feat: Array, feat_len: Array, *,
                       delta_order: int = 2, delta_N: int = 2):
    """feat (B, T, D) -> (B, T, D * (1 + delta_order)); feat_len unchanged."""
    w = jnp.asarray(delta_filter(delta_N))          # (2N+1,)
    kernel = w[:, None, None]                       # (k, in=1, out=1)

    def apply_once(x):
        B, T, D = x.shape
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 1).reshape(B * D, 1, T),
            kernel.transpose(2, 1, 0),
            window_strides=(1,), padding=[(delta_N, delta_N)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        return y.reshape(B, D, T).transpose(0, 2, 1)

    stack = [feat]
    d1 = apply_once(feat)
    stack.append(d1)
    if delta_order == 2:
        stack.append(apply_once(d1))
    return jnp.concatenate(stack, axis=-1), feat_len
