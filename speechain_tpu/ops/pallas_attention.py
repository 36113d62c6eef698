"""Fused (flash-style) attention Pallas kernels.

Why: the benchmark decomposition (docs/BENCHMARKS.md) shows the conformer
encoder HBM- and op-count-bound. The XLA attention path materializes the
``(B, H, T, T)`` fp32 score/softmax/dropout tensors in HBM several times
per layer, and a naive one-(batch,head)-per-grid-step fused kernel (our
first cut) fixed the HBM traffic but turned out op-count bound instead:
512 grid steps x 24 calls = ~12k tiny DMAs per train step, plus ~6k
transpose copies feeding the (B, H, T, Dh) layout (profiled in
probes/profile_step.py: 46 ms of kernel + 22 ms of copies at B=128).

Design (v2):

- **Layout-native**: kernels consume q/k/v as ``(B, T, D)`` — the raw
  projection outputs — and slice heads as pure LANE slices
  (``[:, h*Dh:(h+1)*Dh]``) inside the kernel, so the head-split
  TRANSPOSES (real HBM copies) disappear from the graph entirely and no
  Mosaic-unsupported interior-unit-dim shape casts are needed. Outputs
  come back as (B, T, D), exactly what the output projection consumes.
- **Group-per-grid-step**: each grid step loads a block of ``G`` batch
  rows with ALL heads (one ~2.5 MB DMA instead of 3 x G x H ~77 KB ones)
  and computes the G*H (T, T) attention problems VMEM-resident:
  scores, mask, fp32 softmax, dropout, AV — nothing (T, T) ever touches
  HBM. Grid = B/G steps (16 at B=128), amortizing per-step overhead ~32x.
- Backward recomputes scores/softmax in-kernel (flash-style) and
  regenerates the identical dropout mask from the same per-(b,h) seed.

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
    if os.environ.get("SPEECHAIN_DISABLE_PALLAS"):
        return False
    if os.environ.get("SPEECHAIN_FORCE_FLASH_ATT"):          # force outranks the family
        return True                        # disable (but not the global
    if os.environ.get("SPEECHAIN_DISABLE_FLASH_ATT"):            # kill switch)
        return False
    return not _interpret()


def _pick_group(B: int, T: int, D: int, itemsize: int = 2) -> int:
    """Batch rows per grid step: largest power of two <= 8 dividing B whose
    VMEM working set fits. The pipeline double-buffers every in/out block
    (q, k, v, out: 2 x 4 x G*T*D bytes) and the per-(g,h) score math keeps
    a few live (T, T) fp32 temps; budget ~12 MB of the ~16 MB VMEM. At the
    encoder bench shape (T=201, D=256, bf16) this still picks G=8; at
    longer-T / wider-D shapes (e.g. FastSpeech2 frame-level self-attention,
    T=640, D=384) it backs off instead of overflowing VMEM."""
    budget = 12 * 2**20 - 3 * T * T * 4
    for g in (8, 4, 2, 1):
        if B % g == 0 and 2 * 4 * g * T * D * itemsize <= budget:
            return g
    return 1


def _rel_shift_band(W: Array, T: int) -> Array:
    """bd[i, j] = W[i, j - i + T - 1] for j < T (W: (T, 2T-1)).

    On TPU this is ONE ``tpu.dynamic_rotate`` (per-row shift via
    ``pltpu.roll(stride=1)``) on an (8, 128)-aligned zero-padded band —
    measured ~5x faster than the log2(T) roll+select decomposition
    (probes/kernel_bisect.py: fwd kernel 2.09 -> 1.13 ms/call). The pad
    region is never read: j + T-1-i <= 2T-2 < P. Interpret mode keeps the
    decomposition (the primitive has no CPU lowering)."""
    if _interpret():
        Wp = jnp.pad(W, ((0, 0), (0, 1)))
        return _row_roll(Wp, lambda i: T - 1 - i, left=True)[:, :T]
    P = -(-(2 * T + 8) // 128) * 128
    Rp = -(-T // 8) * 8
    # Mosaic's strided rotate needs the per-vreg shift window within 128
    # lanes: keep the BASE shift a multiple of 8 (row offsets add 0..7)
    # by placing W at column offset c
    c = (P - T + 1) % 8
    Wp = jnp.pad(W, ((0, Rp - T), (c, P - (2 * T - 1) - c)))
    return pltpu.roll(Wp, P - T + 1 - c, 1, stride=1,
                      stride_axis=0)[:T, :T]


def _rel_unshift_band(ds: Array, T: int, L: int) -> Array:
    """Transpose of :func:`_rel_shift_band`: dW[i, m] = ds[i, m - (T-1) + i]
    (zero outside [0, T)); ds (T, T) -> (T, L).

    The strided rotate only supports ASCENDING per-row shifts (the
    literal shift value is not reduced modulo the width), so the
    unshift's descending rolls are turned ascending by lane-reversing
    both sides: rev(rot_asc(rev(dsp))). Lane reversal itself is done as
    an MXU matmul against the anti-identity J (lax.rev sent the Mosaic
    compiler into a multi-10-minute compile) — two (T, P) x (P, P)
    matmuls are far cheaper than the log2(T) roll+select decomposition.
    Exactness checked in numpy for T in {10, 128, 137, 200, 201}."""
    if _interpret():
        dsp = jnp.pad(ds, ((0, 0), (0, T - 1)))
        return _row_roll(dsp, lambda r: T - 1 - r, left=False)[:, :L]
    P = -(-(2 * T + 8) // 128) * 128
    Rp = -(-T // 8) * 8
    c = (P - T + 1) % 8
    base = P - T + 1 - c
    dsp = jnp.pad(ds, ((0, Rp - T), (0, P - T)))
    ia = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    J = (ia + ib == P - 1).astype(ds.dtype)            # anti-identity
    rev = jax.lax.dot_general(dsp, J, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    rolled = pltpu.roll(rev, base, 1, stride=1, stride_axis=0)
    out = jax.lax.dot_general(rolled, J, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[:T, c:c + L]


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


def _softmax_fold(scores: Array):
    """``exp(s - max)`` and its row sum with the normalization DEFERRED:
    forward kernels multiply the small (T, Dh) context output by 1/den
    instead of dividing the (T, T) probability matrix — one full VPU pass
    over the score matrix saved (probes/relpos_opt.py: relpos fwd 1.18 ->
    1.03 ms/call at bench dims). Backward kernels keep the normalized
    :func:`_softmax_fp32` (their formulas consume p itself)."""
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    return p, jnp.sum(p, axis=-1, keepdims=True)


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


def _mask_scores(s, kmask, causal: bool):
    if kmask is not None:
        s = jnp.where(kmask > 0, s, NEG_FILL)          # (1,Tk) broadcast
    if causal:
        r = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(c <= r, s, NEG_FILL)
    return s


def _btd_spec(G, T, D):
    """(B, T, D) arrays blocked G batch rows at a time."""
    return pl.BlockSpec((G, T, D), lambda i: (i, 0, 0))


def _gmask_spec(G, T):
    return pl.BlockSpec((G, 1, T), lambda i: (i, 0, 0))


# ===========================================================================
# standard MHA
# ===========================================================================

def _std_scores(q, k, kmask, scale, causal):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (Tq, Tk)
    return _mask_scores(s, kmask, causal)


def _std_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref, *,
                    scale, causal, rate, G, H):
    i = pl.program_id(0)
    D = q_ref.shape[2]
    Dh = D // H
    for g in range(G):
        kmask = m_ref[g] if m_ref is not None else None      # (1, Tk)
        qg, kg, vg = q_ref[g], k_ref[g], v_ref[g]            # (Tq|Tk, D)
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)                 # lane slice
            q, k, v = qg[:, sl], kg[:, sl], vg[:, sl]
            p, den = _softmax_fold(_std_scores(q, k, kmask, scale, causal))
            if rate > 0.0:
                p = p * _dropout_mask(
                    p.shape, rate, seed_ref[0] + ((i * G + g) * H + h))
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / den
            o_ref[g, :, sl] = o.astype(o_ref.dtype)


def _std_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, *, scale, causal, rate, G, H):
    i = pl.program_id(0)
    D = q_ref.shape[2]
    Dh = D // H
    for g in range(G):
        kmask = m_ref[g] if m_ref is not None else None
        qg, kg, vg, gg = q_ref[g], k_ref[g], v_ref[g], g_ref[g]
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            q, k, v = qg[:, sl], kg[:, sl], vg[:, sl]
            cd = q.dtype
            go = gg[:, sl]                             # stay in cd
            p = _softmax_fp32(_std_scores(q, k, kmask, scale, causal))
            if rate > 0.0:
                dmask = _dropout_mask(
                    p.shape, rate, seed_ref[0] + ((i * G + g) * H + h))
                pt = p * dmask
            else:
                dmask = None
                pt = p
            # dV = P~^T g ; dP~ = g V^T ; dP = dP~*mask ;
            # dS = P*(dP - rowsum(dP*P)); matmuls in cd (fp32 accumulate)
            dv = jax.lax.dot_general(pt.astype(cd), go,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dpt = jax.lax.dot_general(go, v, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dp = dpt * dmask if dmask is not None else dpt
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds_c = ds.astype(cd)
            dq = jax.lax.dot_general(ds_c, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ) * scale
            dk = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ) * scale
            dq_ref[g, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[g, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[g, :, sl] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(q: Array, k: Array, v: Array, seed: Array,
                    scale: float, num_heads: int = 1,
                    causal: bool = False, dropout_rate: float = 0.0,
                    key_mask: Optional[Array] = None) -> Array:
    """Fused MHA: softmax(mask(q k^T * scale)) v, VMEM-resident per group.

    q: **(B, Tq, D)**, k/v: **(B, Tk, D)** — the raw projection outputs;
    heads are LANE slices of width D // num_heads inside the kernel (no
    transpose, no reshape). Rectangular Tq != Tk is supported (decoder
    cross-attention); ``causal`` requires Tq == Tk. key_mask: (B, Tk)
    int32 (1 = attendable) or None. Returns (B, Tq, D) in q.dtype.
    ``seed`` — (1,) int32 array (may be traced, e.g. folded from the step
    rng) keying in-kernel dropout; the backward regenerates the identical
    mask from it.
    """
    return _flash_fwd(q, k, v, seed, scale, num_heads, causal,
                      dropout_rate, key_mask)[0]


def _flash_fwd(q, k, v, seed, scale, num_heads, causal, dropout_rate,
               key_mask):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    assert not causal or Tq == Tk, "causal attention must be square"
    G = _pick_group(B, max(Tq, Tk), D, q.dtype.itemsize)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             _btd_spec(G, Tq, D), _btd_spec(G, Tk, D), _btd_spec(G, Tk, D)]
    args = [seed_arr, q, k, v]
    kw = dict(scale=scale, causal=causal, rate=dropout_rate, G=G,
              H=num_heads)
    if key_mask is not None:
        specs.append(_gmask_spec(G, Tk))
        args.append(key_mask.astype(jnp.int32)[:, None, :])
        kern = functools.partial(_std_fwd_kernel, **kw)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, o_ref, **kkw: _std_fwd_kernel(
                s, qq, kk, vv, None, o_ref, **kkw), **kw)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=specs,
        out_specs=_btd_spec(G, Tq, D),
        out_shape=jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
        interpret=_interpret(),
    )(*args)
    return out, (q, k, v, seed_arr, key_mask)


def _flash_bwd(scale, num_heads, causal, dropout_rate, res, g):
    q, k, v, seed_arr, key_mask = res
    B, Tq, D = q.shape
    Tk = k.shape[1]
    G = _pick_group(B, max(Tq, Tk), D, q.dtype.itemsize)
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             _btd_spec(G, Tq, D), _btd_spec(G, Tk, D), _btd_spec(G, Tk, D)]
    args = [seed_arr, q, k, v]
    kw = dict(scale=scale, causal=causal, rate=dropout_rate, G=G,
              H=num_heads)
    if key_mask is not None:
        specs.append(_gmask_spec(G, Tk))
        args.append(key_mask.astype(jnp.int32)[:, None, :])
        kern = functools.partial(_std_bwd_kernel, **kw)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, gg, dq, dk, dv, **kkw: _std_bwd_kernel(
                s, qq, kk, vv, None, gg, dq, dk, dv, **kkw), **kw)
    specs.append(_btd_spec(G, Tq, D))
    args.append(g)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=specs,
        out_specs=[_btd_spec(G, Tq, D), _btd_spec(G, Tk, D),
                   _btd_spec(G, Tk, D)],
        out_shape=[jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Tk, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Tk, D), q.dtype)],
        interpret=_interpret(),
    )(*args)
    return dq, dk, dv, None, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ===========================================================================
# relative-position MHA (Transformer-XL / conformer)
# ===========================================================================
#
# scores = (q_u k^T + rel_shift(q_v ph^T)) * scale, where q_u = q + bias_u,
# q_v = q + bias_v, ph: (2T-1, D) positional projections (heads = lane
# slices, like q/k/v) and
# rel_shift extracts out[i, j] = W[i, j - i + T - 1] (nn/attention.py
# rel_shift, reference conformer/attention.py:26-46). In-kernel the shift
# is a per-row circular left-roll by (T-1-i) on the zero-padded (T, 2T)
# band; its transpose (for the backward) is the right-roll.
#
# Pass economics (measured, probes/relpos_fwd_bisect.py + relpos_opt.py):
# at encoder dims the (T, T) score matrices are only ~40 vregs, so the
# kernel is bound by the NUMBER of elementwise VPU passes, not by matmul
# FLOPs or the rotate itself. Hence: biases and scale fold into the tiny
# (T, D) qu/qv tensors (no (T, T)/(T, L) broadcast-add or scale passes),
# ph arrives pre-padded into the roll band (no in-kernel pad pass), the
# softmax normalization folds into the (T, Dh) context output, and the
# backward consumes the FULL unshifted band (garbage columns annihilate
# against the zero rows of the padded ph) instead of slicing it clean.

def _band_geometry(T: int):
    """(P, Rp, c): padded band width, sublane-rounded rows, column offset
    that keeps the roll's base shift a multiple of 8 (Mosaic's strided
    rotate wants the per-vreg shift window within 128 lanes)."""
    P = -(-(2 * T + 8) // 128) * 128
    Rp = -(-T // 8) * 8
    c = (P - T + 1) % 8
    return P, Rp, c


def _pad_ph_band(ph, T: int, cd):
    """Place ph (L, D) at row offset ``c`` inside a zero (P, D) band, ONCE
    outside the kernel, so the in-kernel W matmul writes the roll operand
    directly — the per-(g, h) (T, L) -> (Rp, P) pad pass disappears from
    the kernel (VPU pass economics: at T=201 every (T, L) elementwise pass
    costs as much as the matmuls that feed it)."""
    L, D = ph.shape
    P, _, c = _band_geometry(T)
    pad = jnp.zeros((P, D), cd)
    return jax.lax.dynamic_update_slice(pad, ph.astype(cd), (c, 0))


def _qu_qv(qg, bu, bv, scale, cd):
    """Fold the rank-1 biases AND the score scale into the tiny (T, D)
    query tensors: (q+bu)*scale @ k^T == (q k^T + bu k^T) * scale, same for
    the positional branch. Replaces two (T, T)/(T, L) broadcast-add passes
    and the (T, T) scale multiply with two 2-vreg-wide (T, D) passes."""
    qf = qg.astype(jnp.float32)
    qu = ((qf + bu) * scale).astype(cd)
    qv = ((qf + bv) * scale).astype(cd)
    return qu, qv


def _rel_scores2(qu, qv, k, phpad, kmask, T):
    """scores = qu k^T + rel_shift(qv phpad^T); biases and scale are
    pre-folded into qu/qv (:func:`_qu_qv`), phpad is the pre-placed
    (P, Dh) band (:func:`_pad_ph_band`), so the MXU emits the roll
    operand directly and the strided rotate consumes the (T, P) matmul
    result with no pad pass at all (a bf16 row-pad concatenate crashes
    Mosaic — "offset mismatch on non-concat dimension" — and the rotate
    verified exact on unpadded rows for T in {64, 128, 137, 200, 201})."""
    P, _, c = _band_geometry(T)
    ac = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if _interpret():
        # interpret mode: plain band + the log2 row-roll decomposition
        L = 2 * T - 1
        W = jax.lax.dot_general(qv, phpad[c:c + L], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        bd = _rel_shift_band(W, T)
    else:
        W = jax.lax.dot_general(qv, phpad, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        bd = pltpu.roll(W, P - T + 1 - c, 1, stride=1,
                        stride_axis=0)[:, :T]
    s = ac + bd
    return _mask_scores(s, kmask, False)


def _rel_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, ph_ref, bu_ref, bv_ref,
                    m_ref, o_ref, *, scale, rate, G, H):
    i = pl.program_id(0)
    T, D = q_ref.shape[1], q_ref.shape[2]
    Dh = D // H
    cd = q_ref.dtype
    for g in range(G):
        kmask = m_ref[g] if m_ref is not None else None
        qg, kg, vg = q_ref[g], k_ref[g], v_ref[g]            # (T, D)
        qu_g, qv_g = _qu_qv(qg, bu_ref[...], bv_ref[...], scale, cd)
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            k, v = kg[:, sl], vg[:, sl]
            s = _rel_scores2(qu_g[:, sl], qv_g[:, sl], k, ph_ref[:, sl],
                             kmask, T)
            p, den = _softmax_fold(s)
            if rate > 0.0:
                p = p * _dropout_mask(
                    p.shape, rate, seed_ref[0] + ((i * G + g) * H + h))
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / den
            o_ref[g, :, sl] = o.astype(o_ref.dtype)


def _rel_unshift_full(ds_c, T: int):
    """Transpose of the forward rel-shift, returning the FULL (T, P)
    band: dW_full[i, c + m] = ds[i, m - (T-1) + i] for m in [0, L); the
    columns outside [c, c+L) carry roll garbage that every consumer
    multiplies against the zero rows of the padded ph band, so no slice
    pass is spent cleaning them (:func:`_pad_ph_band`)."""
    P, Rp, c = _band_geometry(T)
    L = 2 * T - 1
    if _interpret():
        dW = _rel_unshift_band(ds_c, T, L)            # exact (T, L)
        return jnp.pad(dW, ((0, 0), (c, P - L - c)))
    base = P - T + 1 - c
    dsp = jnp.pad(ds_c, ((0, Rp - T), (0, P - T)))
    ia = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    J = (ia + ib == P - 1).astype(ds_c.dtype)          # anti-identity
    rev = jax.lax.dot_general(dsp, J, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # NB: the strided rotate must stay fp32 — bf16 lane-strided rolls
    # crash the Mosaic compiler (probes/relpos_opt.py bf16roll variant)
    rolled = pltpu.roll(rev, base, 1, stride=1, stride_axis=0)
    out = jax.lax.dot_general(rolled, J, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[:T]


def _unshift_y(ds_c, T: int):
    """``Y`` such that the unshifted full band is ``dW = Jr @ Y`` (row
    flip): Y = roll_asc(flip0(pad(ds))). The row flip turns the unshift's
    DESCENDING per-row shifts ascending (the only direction the strided
    rotate supports) at the cost of (T/Rp)-sided anti-identity matmuls —
    ~5x less flip work than reversing lanes with (P, P) anti-identities,
    and consumers fold the outer flip away entirely (see _rel_bwd_kernel).
    ds is placed at column offset c2 = (c + T - Rp) mod 8 so the base
    shift stays a multiple of 8; the roll stays fp32 (bf16 strided rolls
    crash Mosaic). Exactness: probes/unshift_variants.py."""
    P, Rp, c = _band_geometry(T)
    c2 = (c + T - Rp) % 8
    s0 = (c - c2 + T - Rp) % P
    ia = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    J_T = (ia + ib == T - 1).astype(ds_c.dtype)
    ds_f = jax.lax.dot_general(J_T, ds_c, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    X = jnp.pad(ds_f, ((Rp - T, 0), (c2, P - T - c2)))
    return pltpu.roll(X, s0, 1, stride=1, stride_axis=0)


def _rel_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, ph_ref, bu_ref, bv_ref,
                    m_ref, g_ref, dq_ref, dk_ref, dv_ref, dph_ref, dbu_ref,
                    dbv_ref, *, scale, rate, G, H):
    i = pl.program_id(0)
    T, D = q_ref.shape[1], q_ref.shape[2]
    Dh = D // H
    L = dph_ref.shape[0]
    P, Rp, c = _band_geometry(T)
    cd = q_ref.dtype
    dph_accs = [None] * H
    dbu_accs = [None] * H
    dbv_accs = [None] * H
    for g in range(G):
        kmask = m_ref[g] if m_ref is not None else None
        qg, kg, vg, gg = q_ref[g], k_ref[g], v_ref[g], g_ref[g]
        qu_g, qv_g = _qu_qv(qg, bu_ref[...], bv_ref[...], scale, cd)
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            k, v = kg[:, sl], vg[:, sl]
            qu, qv = qu_g[:, sl], qv_g[:, sl]
            phpad = ph_ref[:, sl]
            go = gg[:, sl]                             # stay in cd
            s = _rel_scores2(qu, qv, k, phpad, kmask, T)
            p = _softmax_fp32(s)
            if rate > 0.0:
                dmask = _dropout_mask(
                    p.shape, rate, seed_ref[0] + ((i * G + g) * H + h))
                pt = p * dmask
            else:
                dmask = None
                pt = p
            # matmuls run in the module compute dtype (bf16 on TPU) with
            # fp32 accumulation; softmax derivative stays fp32.  No
            # (T, T) scale pass: scale is pre-folded into qu/qv, so the
            # score cotangent ds is w.r.t. the POST-scale logits and the
            # chain factor lands on the small (T, Dh)/(1, Dh) grads below.
            pt_c = pt.astype(cd)
            dv = jax.lax.dot_general(pt_c, go, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dpt = jax.lax.dot_general(go, v, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dp = dpt * dmask if dmask is not None else dpt
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds_c = ds.astype(cd)
            if _interpret():
                # exact full-band unshift; consumers as written
                dW_c = _rel_unshift_full(ds_c, T).astype(cd)     # (T, P)
                bd_dq = jax.lax.dot_general(
                    dW_c, phpad, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dph = jax.lax.dot_general(
                    dW_c, qv, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dW_rows = jnp.sum(dW_c.astype(jnp.float32), axis=0,
                                  keepdims=True)                 # (1, P)
            else:
                # Row-flip unshift with the second flip folded into each
                # consumer: dW = Jr @ Y with Y = roll_asc(flip0(pad(ds))),
                # so  dW @ phpad = Jrect2 (Y phpad)   ((T, Rp) flip of a
                #                                      (Rp, Dh) — tiny),
                #     dW^T @ qv = Y^T (Jrect qv)      (flip qv, not dW),
                #     rowsum(dW) = colsum(Y)          (row perms are free)
                # — the two (Rp, P) x (P, P) lane-reversal matmuls (~40%
                # of this kernel's time, probes/unshift_variants.py) are
                # gone; only (T|Rp)-sided anti-identities remain.
                Y = _unshift_y(ds_c, T)                          # (Rp, P)
                Y_c = Y.astype(cd)
                ia = jax.lax.broadcasted_iota(jnp.int32, (Rp, T), 0)
                ib = jax.lax.broadcasted_iota(jnp.int32, (Rp, T), 1)
                Jrect = (ia + ib == Rp - 1).astype(cd)           # (Rp, T)
                yph = jax.lax.dot_general(
                    Y_c, phpad, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # (Rp, Dh)
                bd_dq = jax.lax.dot_general(
                    Jrect.astype(cd), yph.astype(cd),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # (T, Dh)
                qv_f = jax.lax.dot_general(
                    Jrect, qv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # (Rp, Dh)
                dph = jax.lax.dot_general(
                    Y_c, qv_f.astype(cd), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # (P, Dh)
                dW_rows = jnp.sum(Y, axis=0, keepdims=True)      # (1, P)
            dq = (jax.lax.dot_general(ds_c, k, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                  + bd_dq) * scale
            dk = jax.lax.dot_general(ds_c, qu, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dq_ref[g, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[g, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[g, :, sl] = dv.astype(dv_ref.dtype)
            # dbu = rowsum(dqu) = (rowsum over queries of ds) k;
            # dbv likewise via dW — rank-1, no dqu materialization
            ds_rows = jnp.sum(ds, axis=0, keepdims=True) * scale   # (1, T)
            dbu = jax.lax.dot_general(ds_rows.astype(cd), k,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dbv = jax.lax.dot_general((dW_rows * scale).astype(cd), phpad,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            del dmask
            dph_accs[h] = dph if dph_accs[h] is None else dph_accs[h] + dph
            dbu_accs[h] = dbu if dbu_accs[h] is None else dbu_accs[h] + dbu
            dbv_accs[h] = dbv if dbv_accs[h] is None else dbv_accs[h] + dbv

    # accumulator outputs (lane-sliced per head) are revisited every grid
    # step; dph accumulates at the padded (P, Dh) band and is sliced back
    # to the true (L, Dh) rows only here, once per head per grid step
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        dph_h = dph_accs[h][c:c + L]

        @pl.when(i == 0)
        def _(sl=sl, dph_h=dph_h, dbu_h=dbu_accs[h], dbv_h=dbv_accs[h]):
            dph_ref[:, sl] = dph_h.astype(dph_ref.dtype)
            dbu_ref[:, sl] = dbu_h.astype(dbu_ref.dtype)
            dbv_ref[:, sl] = dbv_h.astype(dbv_ref.dtype)

        @pl.when(i > 0)
        def _(sl=sl, dph_h=dph_h, dbu_h=dbu_accs[h], dbv_h=dbv_accs[h]):
            dph_ref[:, sl] = dph_ref[:, sl] + dph_h.astype(dph_ref.dtype)
            dbu_ref[:, sl] = dbu_ref[:, sl] + dbu_h.astype(dbu_ref.dtype)
            dbv_ref[:, sl] = dbv_ref[:, sl] + dbv_h.astype(dbv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def flash_relpos_attention(q: Array, k: Array, v: Array, ph: Array,
                           bias_u: Array, bias_v: Array, seed: Array,
                           scale: float, num_heads: int = 1,
                           dropout_rate: float = 0.0,
                           key_mask: Optional[Array] = None) -> Array:
    """Fused Transformer-XL rel-pos MHA (conformer encoder self-attention).

    q/k/v: **(B, T, D)** raw projection outputs; ph: (2T-1, D) projected
    positional encodings (pos_layer output, no head split); bias_u/bias_v:
    (1, D) (the (H, Dh) params flattened); heads are lane slices of width
    D // num_heads. seed: (1,) int32 (may be traced); key_mask: (B, T) or
    None. Returns (B, T, D).
    """
    return _rel_fwd(q, k, v, ph, bias_u, bias_v, seed, scale, num_heads,
                    dropout_rate, key_mask)[0]


def _rel_fwd(q, k, v, ph, bias_u, bias_v, seed, scale, num_heads,
             dropout_rate, key_mask):
    B, T, D = q.shape
    P = _band_geometry(T)[0]
    G = _pick_group(B, T, D, q.dtype.itemsize)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ph_spec = pl.BlockSpec((P, D), lambda i: (0, 0))
    bias_spec = pl.BlockSpec((1, D), lambda i: (0, 0))
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             _btd_spec(G, T, D), _btd_spec(G, T, D), _btd_spec(G, T, D),
             ph_spec, bias_spec, bias_spec]
    args = [seed_arr, q, k, v, _pad_ph_band(ph, T, q.dtype),
            bias_u.astype(jnp.float32).reshape(1, D),
            bias_v.astype(jnp.float32).reshape(1, D)]
    kw = dict(scale=scale, rate=dropout_rate, G=G, H=num_heads)
    if key_mask is not None:
        specs.append(_gmask_spec(G, T))
        args.append(key_mask.astype(jnp.int32)[:, None, :])
        kern = functools.partial(_rel_fwd_kernel, **kw)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, pp, bu, bv, o_ref, **kkw: _rel_fwd_kernel(
                s, qq, kk, vv, pp, bu, bv, None, o_ref, **kkw), **kw)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=specs,
        out_specs=_btd_spec(G, T, D),
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        interpret=_interpret(),
    )(*args)
    return out, (q, k, v, ph, bias_u, bias_v, seed_arr, key_mask)


def _rel_bwd(scale, num_heads, dropout_rate, res, g):
    q, k, v, ph, bias_u, bias_v, seed_arr, key_mask = res
    B, T, D = q.shape
    L = ph.shape[0]
    P = _band_geometry(T)[0]
    G = _pick_group(B, T, D, q.dtype.itemsize)
    ph_spec = pl.BlockSpec((P, D), lambda i: (0, 0))
    dph_spec = pl.BlockSpec((L, D), lambda i: (0, 0))
    bias_spec = pl.BlockSpec((1, D), lambda i: (0, 0))
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
             _btd_spec(G, T, D), _btd_spec(G, T, D), _btd_spec(G, T, D),
             ph_spec, bias_spec, bias_spec]
    args = [seed_arr, q, k, v, _pad_ph_band(ph, T, q.dtype),
            bias_u.astype(jnp.float32).reshape(1, D),
            bias_v.astype(jnp.float32).reshape(1, D)]
    kw = dict(scale=scale, rate=dropout_rate, G=G, H=num_heads)
    if key_mask is not None:
        specs.append(_gmask_spec(G, T))
        args.append(key_mask.astype(jnp.int32)[:, None, :])
        kern = functools.partial(_rel_bwd_kernel, **kw)
    else:
        kern = functools.partial(
            lambda s, qq, kk, vv, pp, bu, bv, gg, *outs, **kkw:
            _rel_bwd_kernel(s, qq, kk, vv, pp, bu, bv, None, gg, *outs,
                            **kkw), **kw)
    specs.append(_btd_spec(G, T, D))
    args.append(g)
    dq, dk, dv, dph, dbu, dbv = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=specs,
        out_specs=[_btd_spec(G, T, D)] * 3 + [dph_spec, bias_spec,
                                              bias_spec],
        out_shape=[jax.ShapeDtypeStruct((B, T, D), q.dtype)] * 3 + [
            jax.ShapeDtypeStruct((L, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return (dq, dk, dv, dph.astype(ph.dtype),
            dbu.astype(bias_u.dtype),
            dbv.astype(bias_v.dtype), None, None)


flash_relpos_attention.defvjp(_rel_fwd, _rel_bwd)
