"""Normalization modules tuned for TPU memory traffic.

- ``LayerNorm``: drop-in for ``flax.linen.LayerNorm`` with an IDENTICAL
  param tree ("scale"/"bias" under the module name), routing through the
  fused Pallas kernel on TPU. On non-TPU backends (or with
  SPEECHAIN_DISABLE_FUSED_LN / SPEECHAIN_DISABLE_PALLAS set) it computes
  the exact flax formula in XLA.
- ``FastBatchNorm``: drop-in for ``flax.linen.BatchNorm`` (same
  param/batch_stats tree, momentum/eps semantics) whose forward computes
  the batch moments as ONE fused (sum, sum-of-squares) pass and whose
  backward is the 2-reduction custom VJP below.
- ``FlatDropout``: rank-2 mask draw that keeps the matmul layout.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechain_tpu.ops.pallas_layernorm import (fused_layer_norm,
                                                fused_ln_enabled)

Array = jnp.ndarray


@jax.custom_vjp
def bn_norm(u, mean, var, scale, bias, eps):
    """y = (u - mean) * rsqrt(var + eps) * scale + bias in fp32.

    custom_vjp: autodiff of this expression emits an 8-output stat-reduce
    fusion per BatchNorm that re-reads (u, dy) once per output — measured
    12 x 0.449 ms/step across the conformer stack at the bench config
    (~58 GB/s effective, docs/BENCHMARKS.md round-5 trace). The backward
    actually needs only TWO reductions, s1 = sum(dy) and s2 = sum(dy*u);
    every other cotangent is per-channel scalar algebra on (C,) vectors.
    """
    r = jax.lax.rsqrt(var + eps)
    return (u.astype(jnp.float32) - mean) * r * scale + bias


def _bn_norm_fwd(u, mean, var, scale, bias, eps):
    return bn_norm(u, mean, var, scale, bias, eps), (u, mean, var, scale,
                                                     eps)


def _bn_norm_bwd(res, dy):
    u, mean, var, scale, eps = res
    red = tuple(range(u.ndim - 1))
    r = jax.lax.rsqrt(var + eps)
    dyf = dy.astype(jnp.float32)
    s1 = jnp.sum(dyf, red)                                   # (C,)
    s2 = jnp.sum(dyf * u.astype(jnp.float32), red)           # (C,)
    du = (dyf * (scale * r)).astype(u.dtype)
    centered = s2 - mean * s1        # = sum(dy * (u - mean))
    dscale = centered * r
    dbias = s1
    dvar = -0.5 * scale * centered * (r * r * r)
    dmean = -scale * r * s1
    return du, dmean, dvar, dscale, dbias, None


bn_norm.defvjp(_bn_norm_fwd, _bn_norm_bwd)


class FastBatchNorm(nn.Module):
    """Drop-in ``flax.linen.BatchNorm`` over the last axis (feature) with
    a TPU-lean statistics law. Same param tree ({scale, bias}), same
    batch_stats tree ({mean, var}), same momentum-0.9 running update and
    ``axis_name`` cross-replica sync, so checkpoints and config surfaces
    are interchangeable.

    Differences that matter for step time, not for semantics:
    - batch moments come from ONE (sum, sum-of-squares) pass with
      var = E[x^2] - mean^2 (flax's mean((x - mean)^2) needs a second
      dependent pass over the activation — identical value in exact
      arithmetic; stats are computed in fp32 here as in flax);
    - normalize+backward route through :func:`bn_norm` (2-reduction VJP).
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (C,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var", jnp.ones, (C,),
                               jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            n = 1
            for d in x.shape[:-1]:
                n *= d
            xf = x.astype(jnp.float32)
            s = jnp.sum(xf, red)
            ss = jnp.sum(xf * xf, red)
            mean, mean2 = s / n, ss / n
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum) * var)
        y = bn_norm(x, mean, var, scale, bias, self.epsilon)
        return y.astype(self.dtype)


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
