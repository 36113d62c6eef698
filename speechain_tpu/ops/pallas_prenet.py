"""Fused ASR conv2d-prenet core (analytic BatchNorm; XLA default +
opt-in Pallas kernel).

Why: the reference prenet (prenet/conv2d.py:15-280; conformer-large
recipes use conv_dims=[d_model, d_model], kernel 3, stride 2, BatchNorm,
LeakyReLU) produces a (B, T/2, F/2, C) conv1 activation — ~1 GB bf16 at
the bench config — over which the unfused path runs several full HBM
passes that are not inherent to the math: a BatchNorm batch-stats
reduction, a separate normalize+activate pass, and the BN backward's
mean/var reduction chains (round-4 step trace: the prenet stack was
~18.7 ms of a 104 ms step, ~9 ms of it conv2's inherent 3x571 GFLOP MXU
work, the rest traffic).

Two cores share the same analytic-BatchNorm formulation:

- :func:`xla_prenet_core` (DEFAULT) expresses the win in plain XLA ops:
  the BN1 moments come analytically from the patch sufficient
  statistics (idea 1 below), so the BN1 affine folds into the conv1
  weights — act((M @ w1) * g1 + b1) == act(M @ (w1 * g1) + b1) — and
  conv1 + BatchNorm + activation become ONE matmul whose epilogue XLA
  fuses: the conv1 activation is written to HBM exactly once,
  post-activation, with no stats pass over it and no separate
  normalize pass; conv2 stays a stride-2 ``lax.conv`` (the TPU conv
  emitter runs it at near-peak MXU at these channel counts). The
  backward is plain autodiff — input (dM) gradients are exact.

- :func:`fused_prenet_core` (opt-in Pallas kernel) additionally keeps
  the conv1 activation VMEM-resident so conv2 consumes it as it is
  recomputed, forward and backward — but both kernel variants are
  blocked by the real chip's toolchain (see
  :func:`fused_prenet_enabled`); it remains for interpret-mode parity
  tests and for when the toolchain unblocks.

Three ideas make the formulation a good TPU program:

1. ANALYTIC BatchNorm statistics. conv1 (in_channels=1, no bias under
   batchnorm) is linear in the 9 patch values, so over all positions
     sum[c]   = sum_j S_j w1[j, c]
     sumsq[c] = sum_{j,j'} G_{jj'} w1[j, c] w1[j', c]
   with S = M^T 1 (9,) and G = M^T M (9, 9) reductions of the patch
   matrix M — tiny XLA matmuls over the (positions, 9) patch matrix, no
   pass over the conv1 activation at all. Because the stats are computed
   OUTSIDE the kernel as differentiable XLA functions of w1, the kernel
   treats the resulting BN affine (g1 = gamma/sigma, b1 = beta - mu*g1)
   as an independent input and autodiff recovers the full train-mode
   BatchNorm backward (mean/var paths included) with no hand-written BN
   vjp.

2. PHASE-SPLIT layout. conv1 output positions are split by (t', f')
   parity into 4 phase planes stored as flattened (u * Vp + vb, C) rows
   (Vp = F2 + 1, one pad slot per f-row). Both convs have stride 2, so
   every conv2 tap (dt, df) reads phase (dt%2, df%2) at a CONSTANT row
   offset (dt//2)*Vp + (df//2): the 2-D stride-2 convolution becomes 9
   unit-stride-sliced (rows, C) x (C, C) matmuls — big-M MXU work, no
   gather, no im2col of the wide activation.

3. PATCH MATRIX from the small side. in_channels=1 means the im2col of
   the INPUT is only 9x the (B, T, F) spectrogram (~37 MB bf16) — built
   once in XLA as (B, 4, Up*Vp, 16) (9 taps zero-padded to 16 lanes) and
   reused by the forward, the backward, and the S/G statistics.

Reference semantics: prenet/conv2d.py:15-280 (2 blocks, VALID padding,
stride 2, BatchNorm momentum 0.9 eps 1e-5 including every output
position in the stats, activation after BN). The second conv's output is
returned pre-BN2 (flax BatchNorm handles BN2 exactly as before).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (TPU lowering)

from speechain_tpu.nn.feed_forward import get_kernel_activation as get_activation

Array = jnp.ndarray


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def prenet_core_impl():
    """Which fused-prenet core is active: ``None`` (default: unfused flax
    path), ``"xla"``, or ``"pallas"``.

    The default is the UNFUSED path because both fused realizations lose
    on the real chip (measured, not theorized):

    - ``SPEECHAIN_FORCE_FUSED_PRENET=xla``: the XLA core
      (:func:`xla_prenet_core`) — analytic BN1 folded into the conv1
      weights, plain autodiff backward. Numerically exact (fwd, every
      grad, BN stats — tests/test_pallas_prenet.py) but **measured 28.7
      ms/step SLOWER than unfused** at the bench config on v5e
      (BENCH_r05 A/B: 142.9 ms prenet-on vs 114.2 ms prenet-off): plain
      XLA must materialize the (positions, 9) patch matrix to HBM, and
      its 9-wide lane dimension wastes ~93% of every (8, 128) tile, so
      the extra memory traffic dwarfs the ~10 ms of saved BN stat
      passes. A VMEM-resident patch build (the Pallas core) is the only
      layout that wins this fusion.
    - ``SPEECHAIN_FORCE_FUSED_PRENET=1`` (or ``pallas``): the Pallas
      kernel (:func:`fused_prenet_core`). Blocked by the TPU toolchain,
      not by design — the fully unrolled chunk loop OOMs Mosaic's
      scoped-vmem STACK (18-23 MB vs the 16 MB limit) and the rolled
      fori_loop variant crashes `tpu_compile_helper` outright — the
      same failure class that forced the conv-module ddwk out of its
      kernel (ops/pallas_convmod.py). Demoted to ``"xla"`` under
      ``SPEECHAIN_DISABLE_PALLAS`` (which governs Mosaic kernels only).
    - ``SPEECHAIN_DISABLE_FUSED_PRENET=1``: force the unfused flax path
      regardless (the bench A/B lever).
    """
    import os
    if os.environ.get("SPEECHAIN_DISABLE_FUSED_PRENET"):
        return None
    force = os.environ.get("SPEECHAIN_FORCE_FUSED_PRENET", "").lower()
    if force in ("1", "true", "pallas"):
        if os.environ.get("SPEECHAIN_DISABLE_PALLAS"):
            return "xla"
        return "pallas"
    if force == "xla":
        return "xla"
    return None


def fused_prenet_enabled() -> bool:
    """True when the PALLAS core is selected (back-compat shim; see
    :func:`prenet_core_impl` for the full gating)."""
    return prenet_core_impl() == "pallas"


def geom(T: int, F: int):
    """VALID stride-2 kernel-3 twice: conv1 (U1, F1), conv2 (T2, F2);
    phase planes are (Up = T2 + 1) x (Vp = F2 + 1) with one f pad slot."""
    U1, F1 = (T - 3) // 2 + 1, (F - 3) // 2 + 1
    T2, F2 = (U1 - 3) // 2 + 1, (F1 - 3) // 2 + 1
    return U1, F1, T2, F2, T2 + 1, F2 + 1


def build_patches(mel: Array, dtype) -> Array:
    """(B, T, F) -> (B, 4, Up*Vp, 16) patch matrix M with
    M[b, 2*pt+pf, u*Vp+vb, 3*a+b] = mel[b, 4u+2pt+a, 4vb+2pf+b] for valid
    conv1 positions (t' = 2u+pt < U1, f' = 2vb+pf < F1), zero elsewhere
    (pad slots and taps reaching past the spectrogram edge)."""
    B, T, F = mel.shape
    U1, F1, T2, F2, Up, Vp = geom(T, F)
    # pad so every strided slice below is in range; invalid rows are
    # zeroed explicitly afterwards
    melp = jnp.pad(mel, ((0, 0), (0, 4 * Up + 4 - T), (0, 4 * Vp + 4 - F)))
    planes = []
    for pt in (0, 1):
        for pf in (0, 1):
            taps = []
            for a in range(3):
                for b in range(3):
                    sl = jax.lax.slice(
                        melp,
                        (0, 2 * pt + a, 2 * pf + b),
                        (B, 2 * pt + a + 4 * (Up - 1) + 1,
                         2 * pf + b + 4 * (Vp - 1) + 1),
                        (1, 4, 4))                       # (B, Up, Vp)
                    taps.append(sl)
            m = jnp.stack(taps, axis=-1)                 # (B, Up, Vp, 9)
            # zero invalid conv1 positions of this phase
            uu = jnp.arange(Up)[:, None]
            vv = jnp.arange(Vp)[None, :]
            valid = ((2 * uu + pt < U1) & (2 * vv + pf < F1))
            m = jnp.where(valid[None, :, :, None], m, 0.0)
            planes.append(m.reshape(B, Up * Vp, 9))
    M = jnp.stack(planes, axis=1)                        # (B, 4, R, 9)
    return jnp.pad(M, ((0, 0), (0, 0), (0, 0), (0, 7))).astype(dtype)


def patch_stats(M: Array):
    """S (16,) and G (16, 16) fp32 over all samples/phases/rows — the
    sufficient statistics for conv1's BatchNorm batch moments."""
    B = M.shape[0]
    Mf = M.reshape(B * M.shape[1] * M.shape[2], 16)
    S = jnp.sum(Mf.astype(jnp.float32), axis=0)
    G = jax.lax.dot_general(Mf, Mf, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return S, G


def build_patches_std(mel: Array, dtype) -> Array:
    """(B, T, F) -> (B, U1, F1, 9) conv1 im2col in the STANDARD (image)
    layout, M[b, u, v, 3*a+b] = mel[b, 2u+a, 2v+b] — the XLA core's input
    (vs the phase-split 16-lane layout :func:`build_patches` the Pallas
    kernel wants). All rows are valid conv1 positions, so the BN1 batch
    moments divide by exactly B*U1*F1."""
    B, T, F = mel.shape
    U1, F1 = (T - 3) // 2 + 1, (F - 3) // 2 + 1
    taps = []
    for a in range(3):
        for b in range(3):
            taps.append(jax.lax.slice(
                mel, (0, a, b),
                (B, a + 2 * (U1 - 1) + 1, b + 2 * (F1 - 1) + 1),
                (1, 2, 2)))                              # (B, U1, F1)
    return jnp.stack(taps, axis=-1).astype(dtype)


def patch_stats_std(M: Array):
    """S (9,) and G (9, 9) fp32 over all samples/positions of the
    standard-layout patch matrix — the sufficient statistics for conv1's
    BatchNorm batch moments (same math as :func:`patch_stats`, unpadded
    lanes)."""
    K = M.shape[-1]
    Mf = M.reshape(-1, K)
    S = jnp.sum(Mf.astype(jnp.float32), axis=0)
    G = jax.lax.dot_general(Mf, Mf, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return S, G


def xla_prenet_core(M: Array, w1: Array, g1: Array, b1: Array,
                    w2: Array, act_name: str) -> Array:
    """conv2(act(g1 * conv1(M) + b1)) in plain XLA ops (the DEFAULT core).

    The BN1 affine folds into the conv1 weights —
    act((M @ w1) * g1 + b1) == act(M @ (w1 * g1) + b1) — so conv1 +
    BatchNorm-1 + activation is ONE (B*U1*F1, 9) x (9, C) matmul whose
    bias+activation epilogue XLA fuses: the conv1 activation hits HBM
    once, post-activation, with no stats pass (the moments come
    analytically from :func:`patch_stats_std` OUTSIDE this function, as
    differentiable functions of w1, so plain autodiff owns the full
    train-mode BatchNorm backward). conv2 stays a stride-2 VALID
    ``lax.conv`` — the TPU conv emitter runs 3x3xCxC at near-peak MXU.

    M: (B, U1, F1, 9) patches (:func:`build_patches_std`); w1: (9, C)
    fp32; g1/b1: (C,) fp32 BN1 affine; w2: (3, 3, C, C) HWIO fp32.
    Returns the PRE-BN2 conv2 output (B, T2, F2, C) in M's dtype.
    Reference semantics: prenet/conv2d.py:15-280.
    """
    act = get_activation(act_name)
    B, U1, F1, K = M.shape
    C = w1.shape[1]
    cd = M.dtype
    w1g = (w1.astype(jnp.float32) * g1.reshape(1, C)).astype(cd)
    # flat 2-D dot: rank-3+ dots take XLA's slow batch-in-sublanes conv
    # emitter (docs/BENCHMARKS.md round-4 trace, `_dense_flat` finding)
    z = jax.lax.dot_general(M.reshape(B * U1 * F1, K), w1g,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = act(z + b1.reshape(1, C)).astype(cd).reshape(B, U1, F1, C)
    # conv in the compute dtype (matches nn.Conv(dtype=cd); the MXU
    # accumulates bf16 inputs in f32 internally) — a preferred_element_
    # type=f32 here breaks the conv's VJP on mixed bf16/f32 operands
    return jax.lax.conv_general_dilated(
        h, w2.astype(cd), window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


_TAPS = [(dt, df) for dt in range(3) for df in range(3)]


def _conv1_chunk(m_ref, w1c, g1, b1, act, p, lo, rows):
    """act(BN1-affine(conv1)) for `rows` flat rows of phase p starting at
    lo — an MXU (rows, 16) x (16, C) matmul plus two row-broadcast VPU
    passes, recomputed on demand (never materialized to HBM). Stays f32:
    Mosaic's sublane shifts (behind the constant-row-offset tap slices)
    only support 32-bit data; tap slices cast to the compute dtype after
    slicing."""
    mc = m_ref[p, pl.ds(lo, rows), :]
    z = jax.lax.dot_general(mc, w1c, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return act(z * g1 + b1), z


def _tap_slice(x, off, n):
    """rows [off, off+n) of a value — a STATIC slice (off is a Python
    int); Mosaic lowers the unaligned sublane start to a shift."""
    return jax.lax.slice_in_dim(x, off, off + n, axis=0)


def _fwd_kernel(m_ref, w1_ref, g1_ref, b1_ref, w2_ref, o_ref, *,
                T2p, F2, Vp, C, chunk, act_name):
    """One GRID STEP per (uniform) chunk: grid=(B, T2p//chunk). Walking
    the chunks on the grid instead of an in-kernel loop is load-bearing —
    the unrolled loop OOMed Mosaic's scoped-vmem stack (per-iteration
    temporaries are not reused across an unroll) and the rolled fori_loop
    crashed `tpu_compile_helper`; grid steps reuse scoped vmem by
    construction. On-chip outcome (round 5, probes/prenet_ab.py at bench
    dims): this grid-walked variant ALSO crashes `tpu_compile_helper`
    (HTTP 500, subprocess exit 1) on the current toolchain — same crash
    class, so the restructuring dodged the scoped-vmem OOM but not the
    compiler bug; the kernel stays opt-in and interpret-verified.
    M's block index ignores the chunk axis, so the patch
    matrix stays VMEM-resident across a batch row's chunks. Phases are
    processed sequentially (one conv1 phase live at a time) to cap live
    temporaries. T2p is pre-padded to a chunk multiple by the wrapper;
    pad rows produce garbage the wrapper slices off."""
    act = get_activation(act_name)
    cd = o_ref.dtype
    w1c = w1_ref[...].astype(m_ref.dtype)
    g1 = g1_ref[...]
    b1 = b1_ref[...]
    # +8 halo rows (sublane-aligned): the off = Vp+1 tap's slice reaches
    # one row past (chunk+1)*Vp; the extra rows are consumed only by
    # pad-slot outputs (vb = F2) that the wrapper slices off
    rows = (chunk + 1) * Vp + 8
    t0v = pl.program_id(1) * (chunk * Vp)

    acc = jnp.zeros((chunk * Vp, C), jnp.float32)
    for p in range(4):
        x_p = _conv1_chunk(m_ref, w1c, g1, b1, act, p, t0v, rows)[0]
        for t, (dt, df) in enumerate(_TAPS):
            if (dt % 2) * 2 + (df % 2) != p:
                continue
            off = (dt // 2) * Vp + (df // 2)
            xsl = _tap_slice(x_p, off, chunk * Vp).astype(cd)
            acc = acc + jax.lax.dot_general(
                xsl, w2_ref[t].astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(cd)


def _bwd_kernel(m_ref, w1_ref, g1_ref, b1_ref, w2_ref, du_ref,
                dw2_ref, a_ref, sdy_ref, sdyz_ref, *,
                T2p, F2, Vp, C, chunk, act_name):
    """Chunk walk on the grid like the forward; the reduction outputs
    (constant block index) stay VMEM-resident across the whole grid and
    accumulate via read-modify-write. The halo row-block (u = t0+chunk)
    of every chunk is masked out of the reductions — with T2p padding,
    every REAL conv1 row (including u = T2, consumed only as halo by the
    last real chunk) appears as a non-halo row of exactly one chunk, and
    pad-row dy is identically zero because the padded du is zero there."""
    act = get_activation(act_name)
    cd = du_ref.dtype
    w1c = w1_ref[...].astype(m_ref.dtype)
    g1 = g1_ref[...]
    b1 = b1_ref[...]
    rows = (chunk + 1) * Vp + 8    # +8 halo rows, as in the forward
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    t0v = pl.program_id(1) * (chunk * Vp)

    # one aligned dynamic slice of du per grid step; per-tap views are
    # static slices of the value
    duw = du_ref[pl.ds(t0v, chunk * Vp + 2 * (Vp + 1) + 8), :]
    dus = _tap_slice(duw, Vp + 1, chunk * Vp)

    dw2_all = [None] * 9
    A_acc = None
    sdy_acc = None
    sdyz_acc = None
    for p in range(4):
        h, z = _conv1_chunk(m_ref, w1c, g1, b1, act, p, t0v, rows)
        # dh for this phase chunk: sum over the taps that read it, each
        # a constant-offset slice of the (Vp+1)-zero-padded du window
        dh = None
        for t, (dt, df) in enumerate(_TAPS):
            if (dt % 2) * 2 + (df % 2) != p:
                continue
            off = (dt // 2) * Vp + (df // 2)
            sl = _tap_slice(duw, Vp + 1 - off, rows)
            term = jax.lax.dot_general(
                sl, w2_ref[t].astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh = term if dh is None else dh + term
            # conv2 weight grad for this tap: h rows shifted by off
            # against du rows — the forward's slicing identity
            hs = _tap_slice(h, off, chunk * Vp).astype(cd)
            dw2_all[t] = jax.lax.dot_general(
                hs, dus, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = z * g1 + b1
        _, act_vjp = jax.vjp(act, y)
        dy = act_vjp(dh)[0]                              # (rows, C) f32
        ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        dy = jnp.where(ridx < chunk * Vp, dy, 0.0)
        mc = m_ref[p, pl.ds(t0v, rows), :]
        A_p = jax.lax.dot_general(mc.astype(cd), dy.astype(cd),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        A_acc = A_p if A_acc is None else A_acc + A_p
        sdy_p = jnp.sum(dy, axis=0, keepdims=True)
        sdy_acc = sdy_p if sdy_acc is None else sdy_acc + sdy_p
        sdyz_p = jnp.sum(dy * z, axis=0, keepdims=True)
        sdyz_acc = sdyz_p if sdyz_acc is None else sdyz_acc + sdyz_p

    # per-tap ref writes — a 9-way stack/concatenate is exactly the
    # pattern class that crashed tpu_compile_helper in the conv-module
    # backward (ops/pallas_convmod.py docstring)
    @pl.when(first)
    def _():
        for t in range(9):
            dw2_ref[t] = dw2_all[t]
        a_ref[...] = A_acc
        sdy_ref[...] = sdy_acc
        sdyz_ref[...] = sdyz_acc

    @pl.when(jnp.logical_not(first))
    def _():
        for t in range(9):
            dw2_ref[t] = dw2_ref[t] + dw2_all[t]
        a_ref[...] = a_ref[...] + A_acc
        sdy_ref[...] = sdy_ref[...] + sdy_acc
        sdyz_ref[...] = sdyz_ref[...] + sdyz_acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_prenet_core(M: Array, w1: Array, g1: Array, b1: Array,
                      w2: Array, T2: int, F2: int,
                      act_name: str) -> Array:
    """conv2(act(g1 * conv1(M) + b1)) on the phase-split layout.

    M: (B, 4, Up*Vp, 16) patch matrix (:func:`build_patches`);
    w1: (16, C) fp32 (conv1 kernel flattened, taps zero-padded);
    g1/b1: (1, C) fp32 BatchNorm-1 affine (computed OUTSIDE from the
    analytic batch stats so autodiff owns the mean/var paths);
    w2: (9, C, C) fp32 (conv2 kernel, taps-major). Returns the PRE-BN2
    conv2 output in the padded (B, T2*Vp, C) row layout (slice
    [..., :F2, :] after reshaping to (B, T2, Vp, C)).

    INPUT GRADIENTS ARE NOT SUPPORTED on this core: the custom vjp
    returns dM = 0 (the ASR frontend upstream has no parameters), so
    callers must also stop_gradient the M fed to :func:`patch_stats` —
    otherwise the analytic-stats path would leak a PARTIAL input
    gradient. Use :func:`xla_prenet_core` when exact input gradients
    (e.g. saliency) are needed.
    """
    return _fwd(M, w1, g1, b1, w2, T2, F2, act_name)[0]


def _specs(B, R16, C, chunk_rows):
    """Block specs over the (batch, chunk) grid: M and the parameter
    blocks ignore the chunk axis (VMEM-resident across a batch row's
    chunks); the forward output block IS the chunk."""
    m = pl.BlockSpec((1, 4, R16, 16), lambda i, j: (i, 0, 0, 0))
    w1 = pl.BlockSpec((16, C), lambda i, j: (0, 0))
    v = pl.BlockSpec((1, C), lambda i, j: (0, 0))
    w2 = pl.BlockSpec((9, C, C), lambda i, j: (0, 0, 0))
    out = pl.BlockSpec((1, chunk_rows, C), lambda i, j: (i, j, 0))
    return m, w1, v, w2, out


class _Lead:
    """View of a (1, ...)-blocked ref with the leading axis squeezed."""

    def __init__(self, ref):
        self._ref = ref

    def __getattr__(self, k):
        return getattr(self._ref, k)

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return self._ref[(0,) + idx]

    def __setitem__(self, idx, val):
        if not isinstance(idx, tuple):
            idx = (idx,)
        self._ref[(0,) + idx] = val

    @property
    def dtype(self):
        return self._ref.dtype

    @property
    def shape(self):
        return self._ref.shape[1:]


def _pad_geom(T2, F2):
    """Uniform-chunk padding: T2p a chunk multiple COVERING T2+1 rows, so
    the real conv1 row u = T2 (consumed only as conv2 halo) lands as a
    NON-halo row of some chunk and its dy is reduced exactly once even
    when T2 itself is a chunk multiple; M needs (T2p+1)*Vp rows."""
    Vp = F2 + 1
    chunk = max(8, min(T2, 640 // Vp))
    T2p = -(-(T2 + 1) // chunk) * chunk
    return Vp, chunk, T2p


def _fwd(M, w1, g1, b1, w2, T2, F2, act_name):
    B = M.shape[0]
    C = w1.shape[1]
    Vp, chunk, T2p = _pad_geom(T2, F2)
    Rp = (T2p + 1) * Vp + 8
    if M.shape[2] < Rp:
        M_k = jnp.pad(M, ((0, 0), (0, 0), (0, Rp - M.shape[2]), (0, 0)))
    else:
        M_k = M
    kern = functools.partial(
        _fwd_kernel, T2p=T2p, F2=F2, Vp=Vp, C=C, chunk=chunk,
        act_name=act_name)
    m_s, w1_s, v_s, w2_s, out_s = _specs(B, Rp, C, chunk * Vp)
    cd = M.dtype
    out = pl.pallas_call(
        functools.partial(_fwd_wrap, kern=kern),
        grid=(B, T2p // chunk),
        in_specs=[m_s, w1_s, v_s, v_s, w2_s],
        out_specs=out_s,
        out_shape=jax.ShapeDtypeStruct((B, T2p * Vp, C), cd),
        interpret=_interpret(),
    )(M_k, w1.astype(jnp.float32), g1.reshape(1, C).astype(jnp.float32),
      b1.reshape(1, C).astype(jnp.float32), w2.astype(jnp.float32))
    return out[:, :T2 * Vp], (M, w1, g1, b1, w2)


def _fwd_wrap(m_ref, w1_ref, g1_ref, b1_ref, w2_ref, o_ref, *, kern):
    kern(_Lead(m_ref), w1_ref, g1_ref, b1_ref, w2_ref, _Lead(o_ref))


def _bwd_wrap(m_ref, w1_ref, g1_ref, b1_ref, w2_ref, du_ref,
              dw2_ref, a_ref, sdy_ref, sdyz_ref, *, kern):
    kern(_Lead(m_ref), w1_ref, g1_ref, b1_ref, w2_ref, _Lead(du_ref),
         dw2_ref, a_ref, sdy_ref, sdyz_ref)


def _bwd(T2, F2, act_name, res, g):
    M, w1, g1, b1, w2 = res
    B = M.shape[0]
    C = w1.shape[1]
    Vp, chunk, T2p = _pad_geom(T2, F2)
    Rp = (T2p + 1) * Vp + 8
    if M.shape[2] < Rp:
        M_k = jnp.pad(M, ((0, 0), (0, 0), (0, Rp - M.shape[2]), (0, 0)))
    else:
        M_k = M
    cd = M.dtype
    # pad du: Vp+1 leading zero rows (negative tap offsets), zeros out to
    # the chunk-padded T2p plus Vp+1 trailing (positive offsets + halo)
    du = jnp.pad(g.astype(cd),
                 ((0, 0), (Vp + 1, (T2p - T2) * Vp + Vp + 1 + 8), (0, 0)))
    kern = functools.partial(
        _bwd_kernel, T2p=T2p, F2=F2, Vp=Vp, C=C, chunk=chunk,
        act_name=act_name)
    m_s, w1_s, v_s, w2_s, _ = _specs(B, Rp, C, chunk * Vp)
    du_s = pl.BlockSpec((1, T2p * Vp + 2 * (Vp + 1) + 8, C),
                        lambda i, j: (i, 0, 0))
    a_s = pl.BlockSpec((16, C), lambda i, j: (0, 0))
    dw2, A, sdy, sdyz = pl.pallas_call(
        functools.partial(_bwd_wrap, kern=kern),
        grid=(B, T2p // chunk),
        in_specs=[m_s, w1_s, v_s, v_s, w2_s, du_s],
        out_specs=[w2_s, a_s, v_s, v_s],
        out_shape=[jax.ShapeDtypeStruct((9, C, C), jnp.float32),
                   jax.ShapeDtypeStruct((16, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
        interpret=_interpret(),
    )(M_k, w1.astype(jnp.float32), g1.reshape(1, C).astype(jnp.float32),
      b1.reshape(1, C).astype(jnp.float32), w2.astype(jnp.float32), du)
    g1f = g1.reshape(1, C).astype(jnp.float32)
    dw1 = A * g1f                                        # (16, C)
    # d g1 = sum dy * z ; d b1 = sum dy   (z = pre-affine conv1)
    dg1 = sdyz.reshape(g1.shape).astype(g1.dtype)
    db1 = sdy.reshape(b1.shape).astype(b1.dtype)
    return (jnp.zeros_like(M), dw1.astype(w1.dtype), dg1, db1,
            dw2.astype(w2.dtype))


fused_prenet_core.defvjp(_fwd, _bwd)
