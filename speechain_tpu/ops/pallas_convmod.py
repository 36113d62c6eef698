"""Fused conformer convolution-module front half (Pallas, fwd + custom vjp).

Why: the conformer conv module (reference module/conformer/encoder.py:14-65:
pointwise conv -> GLU -> depthwise conv -> BatchNorm -> swish -> pointwise
conv) is the last unfused block in the encoder layer after the round-3
attention/FFN/LayerNorm kernels. The XLA path materializes the (B, T, 2C)
pointwise-conv output in HBM (written by the matmul, re-read by the fused
GLU+depthwise chain, saved again for backward). This kernel runs
``depthwise(glu(x W1 + b1))`` block-resident in VMEM and also accumulates
the per-channel BatchNorm batch statistics (sum, sum-of-squares) in the
same pass, so the depthwise output is read exactly once afterwards (by the
normalize+swish+pointwise-conv2 XLA fusion) instead of twice (stats pass +
normalize pass).

Everything runs in 2-D ``(rows, C)`` layout — the (B, T, C) input is
flattened outside the kernel (layout-preserving) and each grid step owns a
whole number of batch rows. The depthwise 'SAME' conv is K static
sublane ROLLS + masks + fmas (the Mosaic-proven shift pattern from
ops/pallas_attention.py's rel-shift); a roll that crosses a batch-row
boundary lands exactly where the within-utterance validity mask
``0 <= (r mod Tp) + off < T`` is zero, so flattening is sound. BatchNorm
statistics are computed from the ROUNDED (output-dtype) depthwise values,
matching what the XLA BatchNorm sees, and include padded frames inside
[0, T) exactly like the reference's BatchNorm1d; only the sublane-alignment
tail T..Tp (an artifact of this kernel, not of the batch) is excluded.

Backward recomputes the GLU input from x (one matmul — cheaper than the
HBM round trips it replaces), re-reads the forward's depthwise output u for
the statistics cotangents (ds, dss enter as du_tot = du + ds + 2 u dss),
and accumulates the pointwise-conv weight gradients across grid steps in
VMEM (same pattern as ops/pallas_ffn.py).

The DEPTHWISE weight gradient (ddwk/ddwb) is deliberately NOT computed in
the kernel: its natural form is K independent full-column reduces plus a
concatenate, and that pattern blows up the TPU kernel compiler when
combined with the rest of the backward (BENCH_r03's `tpu_compile_helper
exit 1`; probes/convmod_bisect{,2}.py: the kernel compiles in seconds
without the ddwk loop, takes >130 s with ONLY the ddwk loop, and crashes
the compiler with both). Instead the kernel exports the recomputed GLU
activation ``a`` (float32, one extra HBM write it already holds in VMEM)
and the wrapper computes ddwk as K shifted multiply-reduces in XLA —
~0.4 GFLOP at production dims, fused by XLA, numerically identical.

On TPU the ``a`` export is in the compute dtype (bf16; interpret mode
keeps f32 so the CPU tests stay exact). Measured precision baseline on
the real chip (probes/ddwk_bf16_error.py, 2026-08-20, v5e, bench conv
dims B=16 T=200 C=256 K=31, bf16 compute): max relative ddwk error vs
an all-f32 XLA ground truth is **1.9e-3 for the fused kernel with the
bf16 export vs 4.0e-3 for plain-XLA autodiff at the same bf16 forward**
— the export adds nothing beyond the bf16-forward noise every path
carries (the kernel is ~2x MORE accurate than XLA-bf16 thanks to its
in-kernel f32 accumulation). Future tolerance changes: re-run the probe
and update these numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (TPU lowering)

Array = jnp.ndarray


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fused_convmod_enabled() -> bool:
    import os
    if os.environ.get("SPEECHAIN_DISABLE_PALLAS"):
        return False
    if os.environ.get("SPEECHAIN_FORCE_FUSED_CONVMOD"):          # force outranks the family
        return True                        # disable (but not the global
    if os.environ.get("SPEECHAIN_DISABLE_FUSED_CONVMOD"):            # kill switch)
        return False
    return not _interpret()


def _pick_bb(B: int, Tp: int, C: int) -> int:
    """Largest divisor of B (<=8) keeping the block working set ~<6 MB
    (z + a + u + roll temps in f32, double-buffered in/out in x dtype)."""
    for bb in (8, 6, 4, 3, 2, 1):
        if B % bb == 0 and bb * Tp * C * (2 * 4 + 3 * 4) <= 6 * 2**20:
            return bb
    return 1


def _tmod(rows: int, Tp: int):
    """Within-utterance frame index of each flattened row: (rows, 1) i32."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return r % Tp


def _roll_rows(src, off: int):
    """``rolled[r] = src[r + off]`` (circular) on the sublane axis.

    ``jnp.roll`` on axis 0 fails Mosaic lowering on TPU ("Invalid type:
    slice"); ``pltpu.roll`` is the proven path (ops/pallas_attention.py)
    but requires a non-negative shift — rows is static, so reduce mod rows
    in Python.
    """
    rows = src.shape[0]
    shift = (-off) % rows
    if shift == 0:
        return src
    return pltpu.roll(src, shift, 0)


def _dw_shift_sum(src, tmod, weights, K: int, P: int, t_true: int,
                  sign: int):
    """``out[r] = sum_k w[k] * src[r + sign*(k - P)]`` on the flattened
    (rows, C) layout, zero where the read leaves ``[0, t_true)`` within the
    utterance (which also kills batch-boundary wrap-around rows).

    sign=+1 is the depthwise conv; sign=-1 the transposed (gradient) form.
    """
    out = None
    for k in range(K):
        off = sign * (k - P)
        rolled = _roll_rows(src, off)              # rolled[r] = src[r+off]
        valid = (tmod >= -off) & (tmod < t_true - off)
        term = jnp.where(valid, rolled, 0.0) * weights[k]
        out = term if out is None else out + term
    return out


def _fwd_kernel(x_ref, w1_ref, b1_ref, dwk_ref, dwb_ref,
                u_ref, s_ref, ss_ref, *, K, P, t_true, Tp, C):
    i = pl.program_id(0)
    x2 = x_ref[...]
    rows = x2.shape[0]
    tmod = _tmod(rows, Tp)
    z = jax.lax.dot_general(x2, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + \
        b1_ref[...].astype(jnp.float32)
    z = z.astype(x_ref.dtype).astype(jnp.float32)   # match XLA bf16 rounding
    a = z[:, :C] * jax.nn.sigmoid(z[:, C:])
    a = jnp.where(tmod < t_true, a, 0.0)
    dwk = dwk_ref[...].astype(jnp.float32)          # (Kp, C)
    u = _dw_shift_sum(a, tmod, [dwk[k:k + 1, :] for k in range(K)], K, P,
                      t_true, +1)
    u = u + dwb_ref[...].astype(jnp.float32)
    u_out = u.astype(u_ref.dtype)
    u_ref[...] = u_out
    uf = u_out.astype(jnp.float32)
    uf = jnp.where(tmod < t_true, uf, 0.0)
    s = jnp.sum(uf, axis=0, keepdims=True)
    ss = jnp.sum(uf * uf, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        s_ref[...] = s
        ss_ref[...] = ss

    @pl.when(i > 0)
    def _():
        s_ref[...] = s_ref[...] + s
        ss_ref[...] = ss_ref[...] + ss


def _bwd_kernel(x_ref, w1_ref, b1_ref, dwk_ref, u_ref, du_ref, ds_ref,
                dss_ref, dx_ref, dw1_ref, db1_ref, a_ref, *,
                K, P, t_true, Tp, C):
    i = pl.program_id(0)
    x2 = x_ref[...]
    rows = x2.shape[0]
    tmod = _tmod(rows, Tp)
    mask = tmod < t_true

    # recompute GLU input and output from x (flash-style remat)
    z = jax.lax.dot_general(x2, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + \
        b1_ref[...].astype(jnp.float32)
    z = z.astype(x_ref.dtype).astype(jnp.float32)
    ag, gate = z[:, :C], jax.nn.sigmoid(z[:, C:])
    a = jnp.where(mask, ag * gate, 0.0)
    # export the recomputed GLU activation: the XLA side of the backward
    # computes the depthwise weight gradient from it (see module docstring
    # for why ddwk cannot live in this kernel on the TPU toolchain).  On
    # TPU the export is in the compute dtype (bf16): the ddwk reduce-loop
    # fusion is bandwidth-bound (~50 GB/s kLoop, 52 MB/occurrence in the
    # round-4 step trace), so halving a's bytes halves its cost, and the
    # products already carry bf16-forward noise; interpret mode keeps f32
    # so the CPU equivalence tests stay exact.
    a_ref[...] = a.astype(a_ref.dtype)

    # stats cotangents fold into the depthwise-output cotangent
    u = u_ref[...].astype(jnp.float32)
    du = du_ref[...].astype(jnp.float32)
    du_tot = jnp.where(
        mask,
        du + ds_ref[...].astype(jnp.float32) +
        2.0 * u * dss_ref[...].astype(jnp.float32),
        0.0)

    dwk = dwk_ref[...].astype(jnp.float32)
    # da[tau] = sum_k w[k] * du_tot[tau + P - k]  (transposed depthwise)
    da = _dw_shift_sum(du_tot, tmod, [dwk[k:k + 1, :] for k in range(K)],
                       K, P, t_true, -1)
    da = jnp.where(mask, da, 0.0)

    # GLU backward
    dag = da * gate
    dgate = da * ag * gate * (1.0 - gate)
    dz = jnp.concatenate([dag, dgate], axis=1)
    cd = x_ref.dtype
    dz_c = dz.astype(cd)
    dw1 = jax.lax.dot_general(x2, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dz, axis=0, keepdims=True)
    dx = jax.lax.dot_general(dz_c, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = dw1
        db1_ref[...] = db1

    @pl.when(i > 0)
    def _():
        dw1_ref[...] = dw1_ref[...] + dw1
        db1_ref[...] = db1_ref[...] + db1


def _specs(R, C, Kp):
    blk = pl.BlockSpec((R, C), lambda i: (i, 0))
    w1 = pl.BlockSpec((C, 2 * C), lambda i: (0, 0))
    v1 = pl.BlockSpec((1, 2 * C), lambda i: (0, 0))
    dwk = pl.BlockSpec((Kp, C), lambda i: (0, 0))
    vc = pl.BlockSpec((1, C), lambda i: (0, 0))
    return blk, w1, v1, dwk, vc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_conv_glu_dw(x: Array, w1: Array, b1: Array, dwk: Array,
                      dwb: Array, K: int):
    """``u = depthwise_K(glu(x @ w1 + b1)) + dwb`` plus BatchNorm sums.

    x: (B, T, C); w1: (C, 2C); b1: (2C,); dwk: (K, C); dwb: (C,).
    Returns ``(u, s, ss)`` with u: (B, T, C) in x.dtype and s/ss the
    float32 per-channel sum / sum-of-squares of u over all (B, T)
    positions (BatchNorm batch statistics, padded frames included —
    reference conformer/encoder.py:14-65 semantics).
    """
    return _fwd(x, w1, b1, dwk, dwb, K)[0]


def _pad_flatten(x, mult: int):
    """(B, T, C) -> (B*Tp, C) with the time axis zero-padded to a sublane
    multiple; returns (flat, T, Tp)."""
    B, T, C = x.shape
    Tp = -(-T // mult) * mult
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    return x.reshape(B * Tp, C), T, Tp


def _fwd(x, w1, b1, dwk, dwb, K):
    B, T, C = x.shape
    P = (K - 1) // 2
    mult = 16 if x.dtype == jnp.bfloat16 else 8
    x2, _, Tp = _pad_flatten(x, mult)
    Kp = -(-K // 8) * 8
    dwk_p = jnp.pad(dwk.astype(jnp.float32), ((0, Kp - K), (0, 0)))
    Bb = _pick_bb(B, Tp, C)
    blk, w1s, v1, dwks, vc = _specs(Bb * Tp, C, Kp)
    cd = x.dtype
    u, s, ss = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, P=P, t_true=T, Tp=Tp, C=C),
        grid=(B // Bb,),
        in_specs=[blk, w1s, v1, dwks, vc],
        out_specs=[blk, vc, vc],
        out_shape=[jax.ShapeDtypeStruct((B * Tp, C), cd),
                   jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
        interpret=_interpret(),
    )(x2, w1.astype(cd), b1.reshape(1, 2 * C).astype(cd), dwk_p,
      dwb.reshape(1, C).astype(cd))
    out = (u.reshape(B, Tp, C)[:, :T], s[0], ss[0])
    return out, (x2, w1, b1, dwk, u, B, T, Tp)


def _bwd(K, res, g):
    x2, w1, b1, dwk, u, B, T, Tp = res
    du, ds, dss = g
    C = x2.shape[1]
    P = (K - 1) // 2
    Kp = -(-K // 8) * 8
    dwk_p = jnp.pad(dwk.astype(jnp.float32), ((0, Kp - K), (0, 0)))
    dup = jnp.pad(du, ((0, 0), (0, Tp - T), (0, 0))).reshape(B * Tp, C)
    Bb = _pick_bb(B, Tp, C)
    blk, w1s, v1, dwks, vc = _specs(Bb * Tp, C, Kp)
    blk_a = pl.BlockSpec((Bb * Tp, C), lambda i: (i, 0))
    cd = x2.dtype
    a_dtype = jnp.float32 if _interpret() else cd
    dx, dw1, db1, a_flat = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, P=P, t_true=T, Tp=Tp, C=C),
        grid=(B // Bb,),
        in_specs=[blk, w1s, v1, dwks, blk, blk, vc, vc],
        out_specs=[blk, w1s, v1, blk_a],
        out_shape=[jax.ShapeDtypeStruct((B * Tp, C), cd),
                   jax.ShapeDtypeStruct((C, 2 * C), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
                   jax.ShapeDtypeStruct((B * Tp, C), a_dtype)],
        interpret=_interpret(),
    )(x2, w1.astype(cd), b1.reshape(1, 2 * C).astype(cd), dwk_p, u,
      dup.astype(cd), ds.reshape(1, C), dss.reshape(1, C))

    # Depthwise weight gradient in XLA (see module docstring): the kernel
    # already masked ``a`` to zero outside [0, T) within each utterance, so
    # a plain zero-pad reproduces the kernel's validity masks exactly.
    #   ddwk[k] = sum_{b,t} a[b, t + k - P] * du_tot[b, t]
    u3 = u.reshape(B, Tp, C)[:, :T].astype(jnp.float32)
    du_tot = (du.astype(cd).astype(jnp.float32)   # kernel reads du in cd
              + ds.reshape(1, 1, C) + 2.0 * u3 * dss.reshape(1, 1, C))
    a3 = a_flat.reshape(B, Tp, C)[:, :T]
    ap = jnp.pad(a3, ((0, 0), (P, K - 1 - P), (0, 0)))
    ddwk = jnp.stack(
        [jnp.sum(ap[:, k:k + T] * du_tot, axis=(0, 1)) for k in range(K)])
    ddwb = jnp.sum(du_tot, axis=(0, 1))

    return (dx.reshape(B, Tp, C)[:, :T].astype(jnp.result_type(cd)),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            ddwk.astype(dwk.dtype), ddwb.astype(dwk.dtype))


fused_conv_glu_dw.defvjp(_fwd, _bwd)
