"""Can the depthwise weight-grad live in the convmod backward kernel after
all, if formulated as per-k ROW WRITES into the (Kp, C) output ref instead
of K column reduces + a 32-way concatenate (the pattern that crashed
tpu_compile_helper in round 3)?

Variants:
  xla      — current production backward (kernel exports a, ddwk in XLA)
  inkernel — backward kernel computes ddwk rows in-place (no a export)
  standalone — separate ddwk-only kernel fed a + du_tot (a still exported)

Reports compile time and steady-state runtime for each.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.ops import pallas_convmod as pc

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

B, T, C, K = 128, 201, 256, 31
P = (K - 1) // 2
Kp = -(-K // 8) * 8
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, C), jnp.bfloat16)
w1 = jax.random.normal(rng, (C, 2 * C), jnp.float32) * 0.05
b1 = jnp.zeros((2 * C,), jnp.float32)
dwk = jax.random.normal(rng, (K, C), jnp.float32) * 0.1
dwb = jnp.zeros((C,), jnp.float32)
du = jax.random.normal(rng, (B, T, C), jnp.bfloat16).astype(jnp.float32)
ds = jax.random.normal(rng, (C,), jnp.float32) * 0.01
dss = jax.random.normal(rng, (C,), jnp.float32) * 0.01


def _bwd_kernel_inkernel(x_ref, w1_ref, b1_ref, dwk_ref, u_ref, du_ref,
                         ds_ref, dss_ref, dx_ref, dw1_ref, db1_ref,
                         ddwk_ref, ddwb_ref, *, K, P, t_true, Tp, C):
    i = pl.program_id(0)
    x2 = x_ref[...]
    rows = x2.shape[0]
    tmod = pc._tmod(rows, Tp)
    mask = tmod < t_true

    z = jax.lax.dot_general(x2, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + \
        b1_ref[...].astype(jnp.float32)
    z = z.astype(x_ref.dtype).astype(jnp.float32)
    ag, gate = z[:, :C], jax.nn.sigmoid(z[:, C:])
    a = jnp.where(mask, ag * gate, 0.0)

    u = u_ref[...].astype(jnp.float32)
    du = du_ref[...].astype(jnp.float32)
    du_tot = jnp.where(
        mask,
        du + ds_ref[...].astype(jnp.float32) +
        2.0 * u * dss_ref[...].astype(jnp.float32),
        0.0)

    dwk = dwk_ref[...].astype(jnp.float32)
    da = pc._dw_shift_sum(du_tot, tmod, [dwk[k:k + 1, :] for k in range(K)],
                          K, P, t_true, -1)
    da = jnp.where(mask, da, 0.0)

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

    ddwb = jnp.sum(du_tot, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        ddwk_ref[...] = jnp.zeros_like(ddwk_ref)
        ddwb_ref[...] = ddwb

    @pl.when(i > 0)
    def _():
        dw1_ref[...] = dw1_ref[...] + dw1
        db1_ref[...] = db1_ref[...] + db1
        ddwb_ref[...] = ddwb_ref[...] + ddwb

    # ddwk[k] = sum_r a[r + k - P] * du_tot[r]  — per-k row writes, no
    # concatenate, accumulated across grid steps in the output ref
    for k in range(K):
        off = k - P
        rolled = pc._roll_rows(a, off)
        valid = (tmod >= -off) & (tmod < t_true - off)
        row = jnp.sum(jnp.where(valid, rolled, 0.0) * du_tot, axis=0,
                      keepdims=True)
        ddwk_ref[k:k + 1, :] = ddwk_ref[k:k + 1, :] + row


def run_inkernel():
    x2, _, Tp = pc._pad_flatten(x, 16)
    dwk_p = jnp.pad(dwk, ((0, Kp - K), (0, 0)))
    Bb = pc._pick_bb(B, Tp, C)
    blk, w1s, v1, dwks, vc = pc._specs(Bb * Tp, C, Kp)
    cd = x.dtype
    (u, s, ss), _ = pc._fwd(x, w1, b1, dwk, dwb, K)
    u_flat = jnp.pad(u, ((0, 0), (0, Tp - T), (0, 0))).reshape(B * Tp, C)
    dup = jnp.pad(du, ((0, 0), (0, Tp - T), (0, 0))).reshape(B * Tp, C)

    def call(dup_):
        return pl.pallas_call(
            functools.partial(_bwd_kernel_inkernel, K=K, P=P, t_true=T,
                              Tp=Tp, C=C),
            grid=(B // Bb,),
            in_specs=[blk, w1s, v1, dwks, blk, blk, vc, vc],
            out_specs=[blk, w1s, v1, dwks, vc],
            out_shape=[jax.ShapeDtypeStruct((B * Tp, C), cd),
                       jax.ShapeDtypeStruct((C, 2 * C), jnp.float32),
                       jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
                       jax.ShapeDtypeStruct((Kp, C), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32)],
        )(x2, w1.astype(cd), b1.reshape(1, 2 * C).astype(cd), dwk_p,
          u_flat.astype(cd), dup_.astype(cd), ds.reshape(1, C),
          dss.reshape(1, C))

    @jax.jit
    def chain(dup_):
        acc = jnp.zeros((Kp, C), jnp.float32)
        for _ in range(10):
            dx, dw1_, db1_, ddwk_, ddwb_ = call(dup_ + acc[0, 0] * 1e-9)
            acc = acc + ddwk_
        return acc

    tc = time.perf_counter()
    try:
        out = jax.block_until_ready(chain(dup))
    except Exception as e:  # noqa: BLE001
        log(f"inkernel: COMPILE FAIL {type(e).__name__}: {str(e)[:200]}")
        return None
    log(f"inkernel: compiled+ran in {time.perf_counter()-tc:.1f}s")
    best = None
    for trial in range(3):
        t1 = time.perf_counter()
        o = chain(dup + jnp.float32(trial * 1e-7))
        float(o[0, 0])
        d = (time.perf_counter() - t1) / 10
        best = d if best is None else min(best, d)
    log(f"inkernel: {best*1e3:7.3f} ms/bwd-call  ddwk[0,0]={float(out[0,0])/10:.3f}")
    return np.asarray(out) / 10


def run_xla():
    """Current production backward via the public vjp."""
    def loss(x_, w1_, dwk_):
        u, s, ss = pc.fused_conv_glu_dw(x_, w1_, b1, dwk_, dwb, K)
        return (jnp.sum(u.astype(jnp.float32) * du) +
                jnp.sum(s * ds) + jnp.sum(ss * dss))

    grad = jax.grad(loss, argnums=2)

    @jax.jit
    def chain(x_):
        acc = jnp.zeros((K, C), jnp.float32)
        for _ in range(10):
            acc = acc + grad(x_ + acc[0, 0].astype(x_.dtype) * 1e-9,
                             w1, dwk)
        return acc

    tc = time.perf_counter()
    out = jax.block_until_ready(chain(x))
    log(f"xla:      compiled+ran in {time.perf_counter()-tc:.1f}s")
    best = None
    for trial in range(3):
        t1 = time.perf_counter()
        o = chain(x + jnp.bfloat16(trial * 1e-7))
        float(o[0, 0])
        d = (time.perf_counter() - t1) / 10
        best = d if best is None else min(best, d)
    log(f"xla:      {best*1e3:7.3f} ms/fwd+bwd-call  ddwk[0,0]={float(out[0,0])/10:.3f}")
    return np.asarray(out) / 10


def _ddwk_kernel(a_ref, u_ref, du_ref, ds_ref, dss_ref,
                 ddwk_ref, ddwb_ref, *, K, P, t_true, Tp, C):
    i = pl.program_id(0)
    rows = a_ref.shape[0]
    tmod = pc._tmod(rows, Tp)
    mask = tmod < t_true
    a = a_ref[...]
    u = u_ref[...].astype(jnp.float32)
    du = du_ref[...].astype(jnp.float32)
    du_tot = jnp.where(
        mask,
        du + ds_ref[...].astype(jnp.float32) +
        2.0 * u * dss_ref[...].astype(jnp.float32),
        0.0)
    ddwb = jnp.sum(du_tot, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        ddwk_ref[...] = jnp.zeros_like(ddwk_ref)
        ddwb_ref[...] = ddwb

    @pl.when(i > 0)
    def _():
        ddwb_ref[...] = ddwb_ref[...] + ddwb

    for k in range(K):
        off = k - P
        rolled = pc._roll_rows(a, off)
        valid = (tmod >= -off) & (tmod < t_true - off)
        row = jnp.sum(jnp.where(valid, rolled, 0.0) * du_tot, axis=0,
                      keepdims=True)
        ddwk_ref[k:k + 1, :] = ddwk_ref[k:k + 1, :] + row


def run_standalone():
    x2, _, Tp = pc._pad_flatten(x, 16)
    Bb = pc._pick_bb(B, Tp, C)
    cd = x.dtype
    (u, s, ss), (x2r, _, _, _, u_flat, _, _, _) = pc._fwd(x, w1, b1, dwk,
                                                          dwb, K)
    dup = jnp.pad(du, ((0, 0), (0, Tp - T), (0, 0))).reshape(B * Tp, C)
    # recompute a the way the bwd kernel exports it (masked GLU act)
    z = (x2.astype(jnp.float32) @ w1 + b1).astype(cd).astype(jnp.float32)
    tmod = np.arange(B * Tp) % Tp
    a_flat = jnp.where(jnp.asarray(tmod < T)[:, None],
                       z[:, :C] * jax.nn.sigmoid(z[:, C:]), 0.0)

    blk = pl.BlockSpec((Bb * Tp, C), lambda i: (i, 0))
    dwks = pl.BlockSpec((Kp, C), lambda i: (0, 0))
    vc = pl.BlockSpec((1, C), lambda i: (0, 0))

    def call(dup_):
        return pl.pallas_call(
            functools.partial(_ddwk_kernel, K=K, P=P, t_true=T, Tp=Tp, C=C),
            grid=(B // Bb,),
            in_specs=[blk, blk, blk, vc, vc],
            out_specs=[dwks, vc],
            out_shape=[jax.ShapeDtypeStruct((Kp, C), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32)],
        )(a_flat, u_flat, dup_.astype(cd), ds.reshape(1, C),
          dss.reshape(1, C))

    @jax.jit
    def chain(dup_):
        acc = jnp.zeros((Kp, C), jnp.float32)
        for _ in range(10):
            ddwk_, ddwb_ = call(dup_ + acc[0, 0] * 1e-9)
            acc = acc + ddwk_
        return acc

    tc = time.perf_counter()
    try:
        out = jax.block_until_ready(chain(dup))
    except Exception as e:  # noqa: BLE001
        log(f"standalone: COMPILE FAIL {type(e).__name__}: {str(e)[:200]}")
        return None
    log(f"standalone: compiled+ran in {time.perf_counter()-tc:.1f}s")
    best = None
    for trial in range(3):
        t1 = time.perf_counter()
        o = chain(dup + jnp.float32(trial * 1e-7))
        float(o[0, 0])
        d = (time.perf_counter() - t1) / 10
        best = d if best is None else min(best, d)
    log(f"standalone: {best*1e3:7.3f} ms/ddwk-call  "
        f"ddwk[0,0]={float(out[0,0])/10:.3f}")
    return np.asarray(out) / 10


which = sys.argv[1:] or ["xla", "inkernel"]
ref = got = None
if "xla" in which:
    ref = run_xla()
if "inkernel" in which:
    got = run_inkernel()
if "standalone" in which:
    got = run_standalone()
if ref is not None and got is not None:
    err = np.abs(ref - got[:K]).max()
    log(f"max |ddwk_xla - ddwk_kernel| = {err:.2e} "
        f"(scale {np.abs(ref).max():.2f})")
