"""Fused LayerNorm Pallas kernel (fwd + custom-vjp bwd).

Why: the profiled train step (probes/profile_step.py) spends ~17 ms/step
in ``convert_reduce_fusion`` ops — the fp32 mean/variance reductions of
the ~100 LayerNorm applications (4 per conformer layer x 12 layers,
fwd+bwd) over (B, T, D) bf16 activations, each a separate multi-pass XLA
fusion. This kernel computes stats + normalization + affine in ONE
VMEM-resident pass per row block and saves the per-position mean/rstd for
a one-pass backward.

Numerics match ``flax.linen.LayerNorm`` (fp32 stats via E[x^2] - E[x]^2,
the flax ``use_fast_variance`` default; output cast back to the input
dtype). Used by ``nn/norms.py::LayerNorm`` — a drop-in module with the
same param tree ("scale"/"bias") that falls back to the exact flax
formula off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# rows per grid step: 512 x D=256 fp32 working set ~ 0.5 MB
BLOCK_ROWS = 512


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fused_ln_enabled() -> bool:
    """OPT-IN only (SPEECHAIN_FORCE_FUSED_LN=1).

    Measured on v5e (bench.py, B=128 conformer-small): routing the ~100
    per-step LayerNorms through this kernel REGRESSED the train step
    118.7 -> 131.9 ms. XLA fuses each LN's stats into the neighboring
    producer/consumer fusions (the activations are already in registers),
    while a standalone pallas_call pays a full HBM round trip per LN.
    The kernel is kept for workloads where the LN input is not fusable
    (e.g. ahead of a pallas attention consumer) — and as the measured
    record of WHY the default path stays in XLA."""
    import os
    if os.environ.get("SPEECHAIN_DISABLE_PALLAS"):
        return False
    if os.environ.get("SPEECHAIN_FORCE_FUSED_LN"):     # force outranks the
        return True                                    # family disable
    return False


def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, mu_ref, rs_ref, *, eps, D):
    x = x_ref[...].astype(jnp.float32)                 # (R, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mu) * rstd * s_ref[...].astype(jnp.float32) + \
        b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rs_ref[...] = rstd


def _bwd_kernel(x_ref, s_ref, mu_ref, rs_ref, g_ref, dx_ref, dsc_ref,
                dbi_ref, *, D):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu, rstd = mu_ref[...], rs_ref[...]
    xhat = (x - mu) * rstd
    gs = g * s_ref[...].astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = rstd * (gs - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dsc = jnp.sum(g * xhat, axis=0, keepdims=True)     # (1, D)
    dbi = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dsc_ref[...] = dsc
        dbi_ref[...] = dbi

    @pl.when(i > 0)
    def _():
        dsc_ref[...] = dsc_ref[...] + dsc
        dbi_ref[...] = dbi_ref[...] + dbi


def _pick_rows(N: int) -> int:
    r = BLOCK_ROWS
    while r > 8 and N % r:
        r //= 2
    return r if N % r == 0 else N


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x: Array, scale: Array, bias: Array,
                     eps: float = 1e-6) -> Array:
    """LayerNorm over the last axis of ``x`` (any leading shape)."""
    return _ln_fwd(x, scale, bias, eps)[0]


def _ln_fwd(x, scale, bias, eps):
    shape = x.shape
    D = shape[-1]
    x2 = x.reshape(-1, D)
    N = x2.shape[0]
    R = _pick_rows(N)
    row_spec = pl.BlockSpec((R, D), lambda i: (i, 0))
    stat_spec = pl.BlockSpec((R, 1), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, D), lambda i: (0, 0))
    y, mu, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, D=D),
        grid=(N // R,),
        in_specs=[row_spec, vec_spec, vec_spec],
        out_specs=[row_spec, stat_spec, stat_spec],
        out_shape=[jax.ShapeDtypeStruct((N, D), x.dtype),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)],
        interpret=_interpret(),
    )(x2, scale.reshape(1, D), bias.reshape(1, D))
    return y.reshape(shape), (x2, scale, mu, rstd, shape)


def _ln_bwd(eps, res, gout):
    x2, scale, mu, rstd, shape = res
    D = shape[-1]
    g2 = gout.reshape(-1, D)
    N = x2.shape[0]
    R = _pick_rows(N)
    row_spec = pl.BlockSpec((R, D), lambda i: (i, 0))
    stat_spec = pl.BlockSpec((R, 1), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, D), lambda i: (0, 0))
    dx, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, D=D),
        grid=(N // R,),
        in_specs=[row_spec, vec_spec, stat_spec, stat_spec, row_spec],
        out_specs=[row_spec, vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct((N, D), x2.dtype),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)],
        interpret=_interpret(),
    )(x2, scale.reshape(1, D), mu, rstd, g2)
    return (dx.reshape(shape), dsc[0].astype(scale.dtype),
            dbi[0].astype(scale.dtype))


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
