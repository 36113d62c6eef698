"""Fused position-wise feed-forward Pallas kernel (fwd + custom-vjp bwd).

Why: each transformer/conformer FFN materializes its (B*T, fdfwd_dim)
intermediate in HBM — written by the first matmul, re-read by the second,
and saved again for the backward (~52 MB per macaron half at B=128 in the
benchmark config; 24 halves per step). This kernel runs
``act(x W1 + b1) W2 + b2`` (with the FFN's internal dropout) one row-block
at a time with the intermediate VMEM-resident, and the backward RECOMPUTES
it from x (13.5 GFLOP/layer-half — far cheaper than the HBM round trips it
replaces). Weight blocks are grid-invariant (fetched once); weight
gradients accumulate in VMEM across grid steps and are written once.

Used by ``nn/feed_forward.py::PositionwiseFeedForward`` ('linear' type)
on TPU backends; the param tree (in_layer/out_layer {kernel, bias}) is
identical to the nn.Dense path. Dropout uses the per-core hardware PRNG
(same contract as ops/pallas_attention.py: reproducible from a traced
seed, regenerated identically in the backward; different realization than
flax's threefry)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.nn.feed_forward import get_kernel_activation as get_activation
from speechain_tpu.ops.pallas_attention import _dropout_mask

Array = jnp.ndarray

BLOCK_ROWS = 256


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fused_ffn_enabled() -> bool:
    import os
    if os.environ.get("SPEECHAIN_DISABLE_PALLAS"):
        return False
    if os.environ.get("SPEECHAIN_FORCE_FUSED_FFN"):          # force outranks the family
        return True                        # disable (but not the global
    if os.environ.get("SPEECHAIN_DISABLE_FUSED_FFN"):            # kill switch)
        return False
    return not _interpret()


def _pick_rows(N: int) -> int:
    r = BLOCK_ROWS
    while r > 8 and N % r:
        r //= 2
    return r if N % r == 0 else N


def _fwd_kernel(*refs, act_name, rate, res_rate=0.0, alpha=1.0,
                has_res=False):
    if has_res:
        (seed_ref, rseed_ref, x_ref, res_ref, k1_ref, b1_ref, k2_ref,
         b2_ref, o_ref) = refs
    else:
        seed_ref, x_ref, k1_ref, b1_ref, k2_ref, b2_ref, o_ref = refs
    i = pl.program_id(0)
    act = get_activation(act_name)
    x = x_ref[...]
    z = jax.lax.dot_general(x, k1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + \
        b1_ref[...].astype(jnp.float32)
    # activation in the module compute dtype: halves the VPU vregs of the
    # widest (rows, F) elementwise pass in production (bf16) and matches
    # the XLA path, which computes the activation in the Dense output
    # dtype; fp32 callers (CPU equivalence tests) are unchanged
    h = act(z.astype(x.dtype))
    if rate > 0.0:
        h = (h * _dropout_mask(h.shape, rate, seed_ref[0] + i)).astype(
            x.dtype)
    y = jax.lax.dot_general(
        h, k2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + \
        b2_ref[...].astype(jnp.float32)
    if has_res:
        # residual epilogue: out = res + alpha * resdrop(y). Saves the
        # separate elementwise pass XLA cannot fuse into a pallas output.
        if res_rate > 0.0:
            y = y * _dropout_mask(y.shape, res_rate, rseed_ref[0] + i)
        y = res_ref[...].astype(jnp.float32) + alpha * y
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(*refs, act_name, rate, res_rate=0.0, alpha=1.0,
                has_res=False):
    if has_res:
        (seed_ref, rseed_ref, x_ref, k1_ref, b1_ref, k2_ref, g_ref,
         dx_ref, dk1_ref, db1_ref, dk2_ref, db2_ref) = refs
    else:
        (seed_ref, x_ref, k1_ref, b1_ref, k2_ref, g_ref,
         dx_ref, dk1_ref, db1_ref, dk2_ref, db2_ref) = refs
    i = pl.program_id(0)
    act = get_activation(act_name)
    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)
    if has_res:
        # out = res + alpha * resdrop(y): dres = g (returned outside the
        # kernel as the raw cotangent); the inner branch sees
        # alpha * resmask * g
        if res_rate > 0.0:
            g = g * _dropout_mask(g.shape, res_rate, rseed_ref[0] + i)
        g = alpha * g
    z = jax.lax.dot_general(x, k1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + \
        b1_ref[...].astype(jnp.float32)
    # same compute-dtype activation as the forward (bit-identical h)
    h, act_vjp = jax.vjp(act, z.astype(x.dtype))
    if rate > 0.0:
        dmask = _dropout_mask(h.shape, rate, seed_ref[0] + i)
        ht = (h * dmask).astype(x.dtype)
    else:
        dmask = None
        ht = h.astype(x.dtype)
    cd = x.dtype
    g_c = g.astype(cd)
    # out = ht k2 + b2
    dk2 = jax.lax.dot_general(ht, g_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(g, axis=0, keepdims=True)
    dht = jax.lax.dot_general(g_c, k2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh = dht * dmask if dmask is not None else dht
    dz = act_vjp(dh.astype(h.dtype))[0]
    dz_c = dz.astype(cd)
    dk1 = jax.lax.dot_general(x, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
    dx = jax.lax.dot_general(dz_c, k1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dk1_ref[...] = dk1
        db1_ref[...] = db1
        dk2_ref[...] = dk2
        db2_ref[...] = db2

    @pl.when(i > 0)
    def _():
        dk1_ref[...] = dk1_ref[...] + dk1
        db1_ref[...] = db1_ref[...] + db1
        dk2_ref[...] = dk2_ref[...] + dk2
        db2_ref[...] = db2_ref[...] + db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_ffn(x: Array, k1: Array, b1: Array, k2: Array, b2: Array,
              seed: Array, act_name: str = "GELU",
              dropout_rate: float = 0.0) -> Array:
    """``act(x k1 + b1) [dropout] k2 + b2`` with the intermediate
    VMEM-resident. x: (..., D); k1: (D, F); k2: (F, D)."""
    return _ffn_fwd(x, k1, b1, k2, b2, seed, act_name, dropout_rate)[0]


def _ffn_fwd(x, k1, b1, k2, b2, seed, act_name, rate):
    shape = x.shape
    D, F = k1.shape
    Do = k2.shape[1]
    x2 = x.reshape(-1, D)
    N = x2.shape[0]
    R = _pick_rows(N)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    cd = x.dtype
    row_in = pl.BlockSpec((R, D), lambda i: (i, 0))
    row_out = pl.BlockSpec((R, Do), lambda i: (i, 0))
    w1 = pl.BlockSpec((D, F), lambda i: (0, 0))
    w2 = pl.BlockSpec((F, Do), lambda i: (0, 0))
    v1 = pl.BlockSpec((1, F), lambda i: (0, 0))
    v2 = pl.BlockSpec((1, Do), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, act_name=act_name, rate=rate),
        grid=(N // R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), row_in, w1, v1,
                  w2, v2],
        out_specs=row_out,
        out_shape=jax.ShapeDtypeStruct((N, Do), x.dtype),
        interpret=_interpret(),
    )(seed_arr, x2, k1.astype(cd), b1.reshape(1, F), k2.astype(cd),
      b2.reshape(1, Do))
    return out.reshape(*shape[:-1], Do), (x2, k1, b1, k2, seed_arr, shape)


def _ffn_bwd(act_name, rate, res, gout):
    x2, k1, b1, k2, seed_arr, shape = res
    D, F = k1.shape
    Do = k2.shape[1]
    g2 = gout.reshape(-1, Do)
    N = x2.shape[0]
    R = _pick_rows(N)
    cd = x2.dtype
    row_in = pl.BlockSpec((R, D), lambda i: (i, 0))
    row_out = pl.BlockSpec((R, Do), lambda i: (i, 0))
    w1 = pl.BlockSpec((D, F), lambda i: (0, 0))
    w2 = pl.BlockSpec((F, Do), lambda i: (0, 0))
    v1 = pl.BlockSpec((1, F), lambda i: (0, 0))
    v2 = pl.BlockSpec((1, Do), lambda i: (0, 0))
    dx, dk1, db1, dk2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, act_name=act_name, rate=rate),
        grid=(N // R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), row_in, w1, v1,
                  w2, row_out],
        out_specs=[row_in, w1, v1, w2, v2],
        out_shape=[jax.ShapeDtypeStruct((N, D), x2.dtype),
                   jax.ShapeDtypeStruct((D, F), jnp.float32),
                   jax.ShapeDtypeStruct((1, F), jnp.float32),
                   jax.ShapeDtypeStruct((F, Do), jnp.float32),
                   jax.ShapeDtypeStruct((1, Do), jnp.float32)],
        interpret=_interpret(),
    )(seed_arr, x2, k1.astype(cd), b1.reshape(1, F), k2.astype(cd), g2)
    return (dx.reshape(shape), dk1.astype(k1.dtype),
            db1[0].astype(b1.dtype), dk2.astype(k2.dtype),
            db2[0].astype(b1.dtype), None)


fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_ffn_residual(x: Array, res: Array, k1: Array, b1: Array,
                       k2: Array, b2: Array, seed: Array, res_seed: Array,
                       act_name: str = "GELU", dropout_rate: float = 0.0,
                       res_dropout_rate: float = 0.0,
                       res_scale: float = 1.0) -> Array:
    """``res + res_scale * resdrop(act(x k1 + b1) [drop] k2 + b2)`` with
    both the FFN intermediate AND the residual epilogue VMEM-resident.

    The residual add + residual dropout after a pallas FFN otherwise costs
    a separate elementwise pass (XLA cannot epilogue-fuse into a pallas
    output); this folds it into the same kernel. ``dres`` is an exact
    pass-through of the output cotangent (no extra backward work)."""
    return _ffn_res_fwd(x, res, k1, b1, k2, b2, seed, res_seed, act_name,
                        dropout_rate, res_dropout_rate, res_scale)[0]


def _ffn_res_fwd(x, res, k1, b1, k2, b2, seed, res_seed, act_name, rate,
                 res_rate, alpha):
    shape = x.shape
    D, F = k1.shape
    Do = k2.shape[1]
    x2 = x.reshape(-1, D)
    r2 = res.reshape(-1, Do)
    N = x2.shape[0]
    R = _pick_rows(N)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    rseed_arr = jnp.asarray(res_seed, jnp.int32).reshape(1)
    cd = x.dtype
    row_in = pl.BlockSpec((R, D), lambda i: (i, 0))
    row_out = pl.BlockSpec((R, Do), lambda i: (i, 0))
    w1 = pl.BlockSpec((D, F), lambda i: (0, 0))
    w2 = pl.BlockSpec((F, Do), lambda i: (0, 0))
    v1 = pl.BlockSpec((1, F), lambda i: (0, 0))
    v2 = pl.BlockSpec((1, Do), lambda i: (0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, act_name=act_name, rate=rate,
                          res_rate=res_rate, alpha=alpha, has_res=True),
        grid=(N // R,),
        in_specs=[smem, smem, row_in, row_out, w1, v1, w2, v2],
        out_specs=row_out,
        out_shape=jax.ShapeDtypeStruct((N, Do), x.dtype),
        interpret=_interpret(),
    )(seed_arr, rseed_arr, x2, r2, k1.astype(cd), b1.reshape(1, F),
      k2.astype(cd), b2.reshape(1, Do))
    return (out.reshape(*shape[:-1], Do),
            (x2, k1, b1, k2, seed_arr, rseed_arr, shape))


def _ffn_res_bwd(act_name, rate, res_rate, alpha, resids, gout):
    x2, k1, b1, k2, seed_arr, rseed_arr, shape = resids
    D, F = k1.shape
    Do = k2.shape[1]
    g2 = gout.reshape(-1, Do)
    N = x2.shape[0]
    R = _pick_rows(N)
    cd = x2.dtype
    row_in = pl.BlockSpec((R, D), lambda i: (i, 0))
    row_out = pl.BlockSpec((R, Do), lambda i: (i, 0))
    w1 = pl.BlockSpec((D, F), lambda i: (0, 0))
    w2 = pl.BlockSpec((F, Do), lambda i: (0, 0))
    v1 = pl.BlockSpec((1, F), lambda i: (0, 0))
    v2 = pl.BlockSpec((1, Do), lambda i: (0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    dx, dk1, db1, dk2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, act_name=act_name, rate=rate,
                          res_rate=res_rate, alpha=alpha, has_res=True),
        grid=(N // R,),
        in_specs=[smem, smem, row_in, w1, v1, w2, row_out],
        out_specs=[row_in, w1, v1, w2, v2],
        out_shape=[jax.ShapeDtypeStruct((N, D), x2.dtype),
                   jax.ShapeDtypeStruct((D, F), jnp.float32),
                   jax.ShapeDtypeStruct((1, F), jnp.float32),
                   jax.ShapeDtypeStruct((F, Do), jnp.float32),
                   jax.ShapeDtypeStruct((1, Do), jnp.float32)],
        interpret=_interpret(),
    )(seed_arr, rseed_arr, x2, k1.astype(cd), b1.reshape(1, F),
      k2.astype(cd), g2)
    return (dx.reshape(shape), gout, dk1.astype(k1.dtype),
            db1[0].astype(b1.dtype), dk2.astype(k2.dtype),
            db2[0].astype(b1.dtype), None, None)


fused_ffn_residual.defvjp(_ffn_res_fwd, _ffn_res_bwd)
