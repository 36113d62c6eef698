"""Fused (flash-style) attention Pallas kernels.

Why: the benchmark decomposition (docs/BENCHMARKS.md) shows the conformer
encoder at ~15 TFLOP/s effective on a link sustaining 73 — HBM-bound, and
the biggest HBM sink in attention is the materialized ``(B, H, T, T)``
fp32 score/softmax/dropout tensors: the XLA path writes and re-reads them
several times per layer (mask-fill, softmax, dropout, AV einsum). At
B=128, T=201 that is ~83 MB per round trip per layer, 12 layers, fwd+bwd.

Design — *whole-sequence per (batch, head) grid step*, not KV-block
streaming: speech encoders after 4x conv subsampling run at T ≈ 200-750,
so the full (T, T) score matrix fits VMEM comfortably (T=512 → 1 MB
fp32). Each grid step loads q/k/v (T, Dh), computes scores, mask,
softmax (fp32), dropout (in-kernel TPU PRNG) and the AV matmul without
touching HBM; only the (T, Dh) context goes back. This removes ALL
(T, T) HBM traffic — the classic flash-attention goal — while keeping
the kernel simple enough to verify exhaustively. Backward recomputes
scores/softmax in-kernel (flash-style) and regenerates the identical
dropout mask from the same per-(b,h) seed.

Two variants, matching the two modules in ``nn/attention.py``:

- :func:`flash_attention` — standard MHA (optional causal), used by the
  transformer encoder/LM self-attention (reference
  module/transformer/attention.py semantics preserved: scores scaled by
  the caller-provided ``scale``; masked positions filled with
  finfo(float32).min so fully-masked rows stay finite).
- :func:`flash_relpos_attention` — Transformer-XL relative-position MHA
  (reference module/conformer/attention.py): the ``rel_shift`` diagonal
  extraction runs IN-KERNEL via log2(T) static row-rolls (select by the
  bit-decomposed per-row shift amount), so the (T, 2T-1) positional score
  band also never leaves VMEM.

Both are ``jax.custom_vjp``; gradients match the XLA implementation to
float tolerance (tests/test_pallas_attention.py, CPU interpret mode +
TPU). Dropout uses the per-core hardware PRNG seeded per (batch, head):
a different (but valid) noise realization than flax's threefry dropout —
same contract as the hardware-RNG switch documented in
docs/BENCHMARKS.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

NEG_FILL = float(jnp.finfo(jnp.float32).min)
# whole-(T,T)-in-VMEM design: past this the score band would not fit the
# ~16 MB VMEM budget; callers fall back to the XLA path
MAX_T = 768


def _interpret() -> bool:
    # this image's TPU registers as the experimental 'axon' platform
    return jax.default_backend() not in ("tpu", "axon")


def flash_enabled() -> bool:
    """Should the attention modules route through these kernels?

    Default: on TPU backends only (CPU interpret mode is for tests — force
    with SPEECHAIN_FORCE_FLASH_ATT=1). SPEECHAIN_DISABLE_PALLAS (the global
    Mosaic kill-switch, same as ops/frontend.py) or
    SPEECHAIN_DISABLE_FLASH_ATT disable them.
    """
    import os
    if os.environ.get("SPEECHAIN_DISABLE_PALLAS") or \
            os.environ.get("SPEECHAIN_DISABLE_FLASH_ATT"):
        return False
    if os.environ.get("SPEECHAIN_FORCE_FLASH_ATT"):
        return True
    return not _interpret()


def _row_roll(W: Array, amounts_from_row, left: bool) -> Array:
    """Roll each row i of ``W`` (R, L) circularly by ``amounts_from_row(i)``
    (static function of the row index), via log2 decomposition with STATIC
    per-step shifts — the only kind Mosaic supports. Used to implement
    rel_shift (and its transpose) entirely in VMEM."""
    R, L = W.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    amt = amounts_from_row(rows)                       # (R, 1)
    n_bits = max(1, (R - 1).bit_length())
    for k in range(n_bits):
        step = 1 << k
        rolled = jnp.roll(W, -step if left else step, axis=1)
        take = ((amt >> k) & 1) == 1
        W = jnp.where(take, rolled, W)
    return W


def _softmax_fp32(scores: Array) -> Array:
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _dropout_mask(shape, rate: float, seed_scalar):
    """Keep-mask / (1-rate), reproducible from ``seed_scalar`` so the
    backward regenerates the identical mask. On TPU the bits come from the
    hardware PRNG (same rationale as utils/hardware.py: bulk bit draws are
    VPU-cheap there); in interpret mode (CPU tests) a murmur-style integer
    mixer over the element index stands in — same contract, different
    realization."""
    if not _interpret():
        pltpu.prng_seed(seed_scalar)
        bits = pltpu.prng_random_bits(shape)           # uint32
    else:
        R, C = shape
        lin = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) *
               jnp.uint32(C) +
               jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        x = lin * jnp.uint32(2654435761) + seed_scalar.astype(jnp.uint32)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        bits = x ^ (x >> 16)
    thresh = jnp.uint32(int(rate * float(2 ** 32)))
    keep = (bits >= thresh).astype(jnp.float32)
    return keep * (1.0 / (1.0 - rate))


def _mask_scores(s, kmask, causal: bool, T: int):
    if kmask is not None:
        s = jnp.where(kmask > 0, s, NEG_FILL)          # (1,T) broadcast
    if causal:
        r = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        s = jnp.where(c <= r, s, NEG_FILL)
    return s


# ===========================================================================
# standard MHA
# ===========================================================================

def _std_scores(q, k, kmask, scale, causal, T):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (T, T)
    return _mask_scores(s, kmask, causal, T)


def _std_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref, *,
                    scale, causal, rate):
    b, h = pl.program_id(0), pl.program_id(1)
    H = pl.num_programs(1)
    T = q_ref.shape[2]
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    kmask = m_ref[0] if m_ref is not None else None
    p = _softmax_fp32(_std_scores(q, k, kmask, scale, causal, T))
    if rate > 0.0:
        p = p * _dropout_mask(p.shape, rate, seed_ref[0] + b * H + h)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _std_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, *, scale, causal, rate):
    b, h = pl.program_id(0), pl.program_id(1)
    H = pl.num_programs(1)
    T = q_ref.shape[2]
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    g = g_ref[0, 0].astype(jnp.float32)
    kmask = m_ref[0] if m_ref is not None else None
    p = _softmax_fp32(_std_scores(q, k, kmask, scale, causal, T))
    if rate > 0.0:
        dmask = _dropout_mask(p.shape, rate, seed_ref[0] + b * H + h)
        pt = p * dmask
    else:
        dmask = None
        pt = p
    # dV = P~^T g ; dP~ = g V^T ; dP = dP~ * dmask ; dS = P*(dP - rowsum(dP*P))
    dv = jax.lax.dot_general(pt, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(g, v.astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dp = dpt * dmask if dmask is not None else dpt
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))    # (T, T)
    dq = jax.lax.dot_general(ds, k.astype(jnp.float32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bhtd_spec(T, Dh):
    return pl.BlockSpec((1, 1, T, Dh), lambda b, h: (b, h, 0, 0))


def _kmask_spec(T):
    return pl.BlockSpec((1, T), lambda b, h: (b, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q: Array, k: Array, v: Array, seed: Array,
                    scale: float, causal: bool = False,
                    dropout_rate: float = 0.0,
                    key_mask: Optional[Array] = None) -> Array:
    """Fused MHA: softmax(mask(q k^T * scale)) v, per (batch, head) in VMEM.

    q/k/v: (B, H, T, Dh); key_mask: (B, T) int32 (1 = attendable) or None.
    Returns (B, H, T, Dh) in q.dtype. ``seed`` — (1,) int32 array (may be
    traced, e.g. folded from the step rng) keying in-kernel dropout; the
    backward regenerates the identical mask from it.
    """
    return _flash_fwd(q, k, v, seed, scale, causal, dropout_rate,
                      key_mask)[0]


def _flash_fwd(q, k, v, seed, scale, causal, dropout_rate, key_mask):
    B, H, T, Dh = q.shape
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             _bhtd_spec(T, Dh), _bhtd_spec(T, Dh), _bhtd_spec(T, Dh)]
    args = [seed_arr, q, k, v]
    if key_mask is not None:
        specs.append(_kmask_spec(T))
        args.append(key_mask.astype(jnp.int32))
        kern = functools.partial(_std_fwd_kernel, scale=scale,
                                 causal=causal, rate=dropout_rate)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, o_ref, **kw: _std_fwd_kernel(
                s, qq, kk, vv, None, o_ref, **kw),
            scale=scale, causal=causal, rate=dropout_rate)
    out = pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=specs,
        out_specs=_bhtd_spec(T, Dh),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
        interpret=_interpret(),
    )(*args)
    return out, (q, k, v, seed_arr, key_mask)


def _flash_bwd(scale, causal, dropout_rate, res, g):
    q, k, v, seed_arr, key_mask = res
    B, H, T, Dh = q.shape
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             _bhtd_spec(T, Dh), _bhtd_spec(T, Dh), _bhtd_spec(T, Dh)]
    args = [seed_arr, q, k, v]
    if key_mask is not None:
        specs.append(_kmask_spec(T))
        args.append(key_mask.astype(jnp.int32))
        kern = functools.partial(_std_bwd_kernel, scale=scale,
                                 causal=causal, rate=dropout_rate)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, gg, dq, dk, dv, **kw: _std_bwd_kernel(
                s, qq, kk, vv, None, gg, dq, dk, dv, **kw),
            scale=scale, causal=causal, rate=dropout_rate)
    specs.append(_bhtd_spec(T, Dh))
    args.append(g)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=specs,
        out_specs=[_bhtd_spec(T, Dh)] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype)] * 3,
        interpret=_interpret(),
    )(*args)
    return dq, dk, dv, None, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ===========================================================================
# relative-position MHA (Transformer-XL / conformer)
# ===========================================================================
#
# scores = (q_u k^T + rel_shift(q_v ph^T)) * scale, where q_u = q + bias_u,
# q_v = q + bias_v, ph: (H, 2T-1, Dh) positional projections and
# rel_shift extracts out[i, j] = W[i, j - i + T - 1] (nn/attention.py
# rel_shift, reference conformer/attention.py:26-46). In-kernel the shift
# is a per-row circular left-roll by (T-1-i) on the zero-padded (T, 2T)
# band; its transpose (for the backward) is the right-roll.

def _rel_scores(q, k, ph, bu, bv, kmask, scale, T):
    qu = q.astype(jnp.float32) + bu
    qv = q.astype(jnp.float32) + bv
    ac = jax.lax.dot_general(qu.astype(q.dtype), k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    W = jax.lax.dot_general(qv.astype(q.dtype), ph,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (T, 2T-1)
    Wp = jnp.pad(W, ((0, 0), (0, 1)))                  # (T, 2T) zero col
    bd = _row_roll(Wp, lambda i: T - 1 - i, left=True)[:, :T]
    s = (ac + bd) * scale
    return _mask_scores(s, kmask, False, T), qu, qv


def _rel_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, ph_ref, bu_ref, bv_ref,
                    m_ref, o_ref, *, scale, rate):
    b, h = pl.program_id(0), pl.program_id(1)
    H = pl.num_programs(1)
    T = q_ref.shape[2]
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    ph, bu, bv = ph_ref[0], bu_ref[0], bv_ref[0]
    kmask = m_ref[0] if m_ref is not None else None
    s, _, _ = _rel_scores(q, k, ph, bu, bv, kmask, scale, T)
    p = _softmax_fp32(s)
    if rate > 0.0:
        p = p * _dropout_mask(p.shape, rate, seed_ref[0] + b * H + h)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _rel_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, ph_ref, bu_ref, bv_ref,
                    m_ref, g_ref, dq_ref, dk_ref, dv_ref, dph_ref, dbu_ref,
                    dbv_ref, *, scale, rate):
    # grid (H, B) with batch FASTEST so the h-indexed outputs (dph, dbu,
    # dbv) are revisited on consecutive steps and accumulate in VMEM
    h, b = pl.program_id(0), pl.program_id(1)
    H = pl.num_programs(0)
    T = q_ref.shape[2]
    L = ph_ref.shape[1]
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    ph, bu, bv = ph_ref[0], bu_ref[0], bv_ref[0]
    g = g_ref[0, 0].astype(jnp.float32)
    kmask = m_ref[0] if m_ref is not None else None
    s, qu, qv = _rel_scores(q, k, ph, bu, bv, kmask, scale, T)
    p = _softmax_fp32(s)
    if rate > 0.0:
        dmask = _dropout_mask(p.shape, rate, seed_ref[0] + b * H + h)
        pt = p * dmask
    else:
        dmask = None
        pt = p
    dv = jax.lax.dot_general(pt, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(g, v.astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dp = dpt * dmask if dmask is not None else dpt
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    # ac-path grads
    dqu = jax.lax.dot_general(ds, k.astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, qu, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # bd-path grads: dW = unshift(ds) — transpose of the forward roll
    dsp = jnp.pad(ds, ((0, 0), (0, T - 1)))            # (T, 2T-1)
    dW = _row_roll(dsp, lambda i: T - 1 - i, left=False)
    dW = dW[:, :L]
    dqv = jax.lax.dot_general(dW, ph.astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dph = jax.lax.dot_general(dW, qv, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dq_ref[0, 0] = (dqu + dqv).astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    dbu = jnp.sum(dqu, axis=0, keepdims=True)          # (1, Dh)
    dbv = jnp.sum(dqv, axis=0, keepdims=True)

    @pl.when(b == 0)
    def _():
        dph_ref[0] = dph.astype(dph_ref.dtype)
        dbu_ref[...] = dbu.astype(dbu_ref.dtype)
        dbv_ref[...] = dbv.astype(dbv_ref.dtype)

    @pl.when(b > 0)
    def _():
        dph_ref[0] = dph_ref[0] + dph.astype(dph_ref.dtype)
        dbu_ref[...] = dbu_ref[...] + dbu.astype(dbu_ref.dtype)
        dbv_ref[...] = dbv_ref[...] + dbv.astype(dbv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def flash_relpos_attention(q: Array, k: Array, v: Array, ph: Array,
                           bias_u: Array, bias_v: Array, seed: Array,
                           scale: float, dropout_rate: float = 0.0,
                           key_mask: Optional[Array] = None) -> Array:
    """Fused Transformer-XL rel-pos MHA (conformer encoder self-attention).

    q/k/v: (B, H, T, Dh); ph: (H, 2T-1, Dh) projected positional
    encodings; bias_u/bias_v: (H, Dh); seed: (1,) int32 (may be traced);
    key_mask: (B, T) or None.
    """
    return _rel_fwd(q, k, v, ph, bias_u, bias_v, seed, scale,
                    dropout_rate, key_mask)[0]


def _rel_fwd(q, k, v, ph, bias_u, bias_v, seed, scale, dropout_rate,
             key_mask):
    B, H, T, Dh = q.shape
    L = ph.shape[1]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ph_spec = pl.BlockSpec((1, L, Dh), lambda b, h: (h, 0, 0))
    bias_spec = pl.BlockSpec((1, Dh), lambda b, h: (h, 0))
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             _bhtd_spec(T, Dh), _bhtd_spec(T, Dh), _bhtd_spec(T, Dh),
             ph_spec, bias_spec, bias_spec]
    args = [seed_arr, q, k, v, ph.astype(q.dtype),
            bias_u.astype(jnp.float32), bias_v.astype(jnp.float32)]
    if key_mask is not None:
        specs.append(_kmask_spec(T))
        args.append(key_mask.astype(jnp.int32))
        kern = functools.partial(_rel_fwd_kernel, scale=scale,
                                 rate=dropout_rate)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, pp, bu, bv, o_ref, **kw: _rel_fwd_kernel(
                s, qq, kk, vv, pp, bu, bv, None, o_ref, **kw),
            scale=scale, rate=dropout_rate)
    out = pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=specs,
        out_specs=_bhtd_spec(T, Dh),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
        interpret=_interpret(),
    )(*args)
    return out, (q, k, v, ph, bias_u, bias_v, seed_arr, key_mask)


def _rel_bwd(scale, dropout_rate, res, g):
    q, k, v, ph, bias_u, bias_v, seed_arr, key_mask = res
    B, H, T, Dh = q.shape
    L = ph.shape[1]
    # (H, B) grid, batch fastest: h-indexed accumulator outputs
    tdspec = pl.BlockSpec((1, 1, T, Dh), lambda h, b: (b, h, 0, 0))
    ph_spec = pl.BlockSpec((1, L, Dh), lambda h, b: (h, 0, 0))
    bias_spec = pl.BlockSpec((1, Dh), lambda h, b: (h, 0))
    mask_spec = pl.BlockSpec((1, T), lambda h, b: (b, 0))
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             tdspec, tdspec, tdspec, ph_spec, bias_spec, bias_spec]
    args = [seed_arr, q, k, v, ph.astype(q.dtype),
            bias_u.astype(jnp.float32), bias_v.astype(jnp.float32)]
    if key_mask is not None:
        specs.append(mask_spec)
        args.append(key_mask.astype(jnp.int32))
        kern = functools.partial(_rel_bwd_kernel, scale=scale,
                                 rate=dropout_rate)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, pp, bu, bv, gg, *outs, **kw:
            _rel_bwd_kernel(s, qq, kk, vv, pp, bu, bv, None, gg, *outs,
                            **kw),
            scale=scale, rate=dropout_rate)
    specs.append(tdspec)
    args.append(g)
    dq, dk, dv, dph, dbu, dbv = pl.pallas_call(
        kern,
        grid=(H, B),
        in_specs=specs,
        out_specs=[tdspec, tdspec, tdspec, ph_spec, bias_spec, bias_spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype)] * 3 + [
            jax.ShapeDtypeStruct((H, L, Dh), jnp.float32),
            jax.ShapeDtypeStruct((H, Dh), jnp.float32),
            jax.ShapeDtypeStruct((H, Dh), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return (dq, dk, dv, dph.astype(ph.dtype), dbu.astype(bias_u.dtype),
            dbv.astype(bias_v.dtype), None, None)


flash_relpos_attention.defvjp(_rel_fwd, _rel_bwd)
