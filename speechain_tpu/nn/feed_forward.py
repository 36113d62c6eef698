"""Position-wise feed-forward layer.

Rebuild of reference ``module/transformer/feed_forward.py:17``. Supports
'linear' (two Dense layers) and 'conv' (two 1-D convs, default kernel 3)
variants; activation selected by its torch.nn class name for YAML-config
parity ('ReLU', 'GELU', 'SiLU', ...).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch.nn activation class name -> jax function (train_util.py swish included)
ACTIVATIONS = {
    "ReLU": jax.nn.relu,
    "GELU": jax.nn.gelu,
    "SiLU": jax.nn.silu,
    "Swish": jax.nn.silu,
    "Tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
    "ELU": jax.nn.elu,
    "LeakyReLU": jax.nn.leaky_relu,
    "Softplus": jax.nn.softplus,
    "Hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "Identity": lambda x: x,
}


def get_activation(name: str):
    if name not in ACTIVATIONS:
        raise KeyError(f"unknown activation {name!r}; known: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


class PositionwiseFeedForward(nn.Module):
    d_model: int
    fdfwd_dim: int
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "ReLU"
    fdfwd_args: Dict[str, Any] = None
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        args = dict(self.fdfwd_args or {})
        act = get_activation(self.fdfwd_activation)
        if self.fdfwd_type == "linear":
            h = nn.Dense(self.fdfwd_dim, dtype=self.dtype, name="in_layer")(x)
        elif self.fdfwd_type == "conv":
            ks = int(args.pop("kernel_size", 3))
            h = nn.Conv(self.fdfwd_dim, kernel_size=(ks,), padding="SAME",
                        dtype=self.dtype, name="in_layer")(x)
        else:
            raise NotImplementedError(f"fdfwd_type {self.fdfwd_type!r}")
        h = act(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if self.fdfwd_type == "linear":
            out = nn.Dense(self.d_model, dtype=self.dtype, name="out_layer")(h)
        else:
            ks = int((self.fdfwd_args or {}).get("kernel_size", 3))
            out = nn.Conv(self.d_model, kernel_size=(ks,), padding="SAME",
                          dtype=self.dtype, name="out_layer")(h)
        return out
