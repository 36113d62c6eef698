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
    # exact erf GELU: torch.nn.GELU() defaults to approximate='none',
    # while jax.nn.gelu defaults to the tanh approximation — caught by
    # tests/test_torch_parity_conformer.py (up to ~1e-3 drift)
    "GELU": lambda x: jax.nn.gelu(x, approximate=False),
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


@jax.custom_jvp
def _erf_rational(x):
    """fp32 rational erf (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7 —
    below fp32 epsilon at gelu scales). Built from exp/mul/add only, all
    of which Mosaic lowers; ``jax.nn.gelu(approximate=False)`` emits an
    ``erfc`` primitive that has NO Pallas TPU lowering rule (observed:
    NotImplementedError in lowering.py on the real chip)."""
    xf = x.astype(jnp.float32)
    s = jnp.sign(xf)
    a = jnp.abs(xf)
    t = 1.0 / (1.0 + 0.3275911 * a)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                 - 0.284496736) * t + 0.254829592) * t) * jnp.exp(-a * a)
    return (s * y).astype(x.dtype)


@_erf_rational.defjvp
def _erf_rational_jvp(primals, tangents):
    # exact analytic derivative 2/sqrt(pi) * exp(-x^2): autodiffing
    # through the 5th-order rational would materialize ~6 extra (rows, F)
    # f32 temporaries on the Mosaic vmem STACK in kernel backwards —
    # measured 16.36M vs the 16M scoped-vmem limit at the FFN kernel's
    # production block shape. The closed form is also the truer gradient.
    (x,), (dx,) = primals, tangents
    xf = x.astype(jnp.float32)
    d = jnp.asarray(1.1283791670955126, jnp.float32) * jnp.exp(-xf * xf)
    return _erf_rational(x), (d * dx.astype(jnp.float32)).astype(x.dtype)


# in-kernel (Pallas) activation table: identical to ACTIVATIONS except
# GELU, whose exact-erf form is expressed via the rational erf above so
# the kernel lowers on TPU. Max |gelu drift| vs lax erf ~1e-7 * |x| —
# invisible at the kernels' bf16/fp32 test tolerances.
KERNEL_ACTIVATIONS = dict(
    ACTIVATIONS,
    GELU=lambda x: 0.5 * x * (1.0 + _erf_rational(
        x * jnp.asarray(0.7071067811865476, x.dtype))),
)


def get_kernel_activation(name: str):
    """Activation for use INSIDE Pallas kernel bodies (see
    KERNEL_ACTIVATIONS). Module-level (XLA) code uses get_activation."""
    if name not in KERNEL_ACTIVATIONS:
        raise KeyError(f"unknown activation {name!r}; "
                       f"known: {sorted(KERNEL_ACTIVATIONS)}")
    return KERNEL_ACTIVATIONS[name]


def _ffn_fused_ok(x, d_model: int, fdfwd_dim: int) -> bool:
    from speechain_tpu.ops.pallas_ffn import fused_ffn_enabled
    if not fused_ffn_enabled():
        return False
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return (n % 8 == 0 and x.shape[-1] % 128 == 0 and
            fdfwd_dim % 128 == 0 and d_model % 128 == 0)


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible {kernel, bias} params without running
    the matmul — lets the fused-FFN kernel consume them directly while the
    param tree stays byte-identical to the nn.Dense path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class PositionwiseFeedForward(nn.Module):
    d_model: int
    fdfwd_dim: int
    fdfwd_type: str = "linear"
    fdfwd_activation: str = "ReLU"
    fdfwd_args: Dict[str, Any] = None
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 residual: jnp.ndarray = None, res_scale: float = 1.0,
                 res_dropout: float = 0.0) -> jnp.ndarray:
        """Optional fused residual epilogue: when ``residual`` is given the
        module returns ``residual + res_scale * resdrop(ffn(x))`` — on the
        pallas path this folds the add + residual dropout into the kernel
        (XLA cannot epilogue-fuse a pallas output); on the XLA path the
        semantics are identical (elementwise epilogue, XLA fuses it)."""
        args = dict(self.fdfwd_args or {})
        act = get_activation(self.fdfwd_activation)
        if self.fdfwd_type == "linear" and _ffn_fused_ok(
                x, self.d_model, self.fdfwd_dim):
            # one VMEM-resident pass: matmul + activation + dropout +
            # matmul; the (N, fdfwd_dim) intermediate never touches HBM
            # (ops/pallas_ffn.py)
            from speechain_tpu.ops.pallas_ffn import (fused_ffn,
                                                      fused_ffn_residual)
            D = x.shape[-1]
            k1, b1 = _DenseParams(D, self.fdfwd_dim, name="in_layer")()
            k2, b2 = _DenseParams(self.fdfwd_dim, self.d_model,
                                  name="out_layer")()
            rate = self.dropout if train and self.dropout > 0.0 else 0.0
            rrate = res_dropout if train and res_dropout > 0.0 else 0.0

            def draw_seed(need):
                if not need:
                    return jnp.zeros((1,), jnp.int32)
                return jax.random.randint(
                    self.make_rng("dropout"), (1,),
                    jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)

            seed = draw_seed(rate > 0.0)
            import os
            if residual is not None and not os.environ.get(
                    "SPEECHAIN_DISABLE_FUSED_FFN_RESIDUAL"):
                rseed = draw_seed(rrate > 0.0)
                return fused_ffn_residual(
                    x.astype(self.dtype), residual.astype(self.dtype),
                    k1, b1, k2, b2, seed, rseed, self.fdfwd_activation,
                    rate, rrate, res_scale)
            out = fused_ffn(x.astype(self.dtype), k1, b1, k2, b2, seed,
                            self.fdfwd_activation, rate)
            if residual is not None:     # ablation path (flag above)
                out = nn.Dropout(res_dropout,
                                 deterministic=not train)(out)
                out = residual + res_scale * out
            return out
        if self.fdfwd_type == "linear":
            from speechain_tpu.nn.attention import _dense_flat
            h = _dense_flat(nn.Dense(self.fdfwd_dim, dtype=self.dtype,
                                     name="in_layer"), x)
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
            from speechain_tpu.nn.attention import _dense_flat
            out = _dense_flat(nn.Dense(self.d_model, dtype=self.dtype,
                                       name="out_layer"), h)
        else:
            ks = int((self.fdfwd_args or {}).get("kernel_size", 3))
            out = nn.Conv(self.d_model, kernel_size=(ks,), padding="SAME",
                          dtype=self.dtype, name="out_layer")(h)
        if residual is not None:
            out = nn.Dropout(res_dropout, deterministic=not train)(out)
            out = residual + res_scale * out
        return out
