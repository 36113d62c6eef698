"""Bisect which piece of the convmod BACKWARD kernel kills tpu_compile_helper.

Each variant is the bwd kernel with one suspect knocked out (wrong math,
same structure). Run each in its own pallas_call; report OK/FAIL.
Variants:
  full      — everything (expected FAIL, the repro)
  no_ddwk   — skip the 31-roll weight-grad loop + concat
  no_da     — skip the transposed depthwise (sign=-1 shift sum)
  no_dw1    — skip the (C,rows)x(rows,2C) transposed-contraction matmul
  no_dx     — skip the (rows,2C)x(2C,C)^T matmul
  no_accum  — skip the pl.when accumulation of weight grads
  only_ddwk — JUST the ddwk loop (plus minimal inputs)
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.ops.pallas_convmod import (
    _tmod, _roll_rows, _dw_shift_sum, _specs, _pad_flatten, _pick_bb)

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

B, T, C, K = 8, 201, 256, 31
P = (K - 1) // 2
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, C), dt)
w1 = (jax.random.normal(rng, (C, 2 * C), jnp.float32) * 0.05)
b1 = jnp.zeros((2 * C,), jnp.float32)
dwk = jax.random.normal(rng, (K, C), jnp.float32) * 0.1
mult = 16
x2, _, Tp = _pad_flatten(x, mult)
Kp = -(-K // 8) * 8
dwk_p = jnp.pad(dwk, ((0, Kp - K), (0, 0)))
Bb = _pick_bb(B, Tp, C)
u = jax.random.normal(rng, (B * Tp, C), dt)
du = jax.random.normal(rng, (B * Tp, C), dt)
ds = jnp.zeros((1, C), jnp.float32)
dss = jnp.zeros((1, C), jnp.float32)


def make_kernel(variant):
    def kern(x_ref, w1_ref, b1_ref, dwk_ref, u_ref, du_ref, ds_ref,
             dss_ref, dx_ref, dw1_ref, db1_ref, ddwk_ref, ddwb_ref):
        i = pl.program_id(0)
        x2 = x_ref[...]
        rows = x2.shape[0]
        tmod = _tmod(rows, Tp)
        mask = tmod < T
        z = jax.lax.dot_general(x2, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + \
            b1_ref[...].astype(jnp.float32)
        z = z.astype(x_ref.dtype).astype(jnp.float32)
        ag, gate = z[:, :C], jax.nn.sigmoid(z[:, C:])
        a = jnp.where(mask, ag * gate, 0.0)
        uu = u_ref[...].astype(jnp.float32)
        duv = du_ref[...].astype(jnp.float32)
        du_tot = jnp.where(
            mask, duv + ds_ref[...].astype(jnp.float32) +
            2.0 * uu * dss_ref[...].astype(jnp.float32), 0.0)
        dwkf = dwk_ref[...].astype(jnp.float32)

        if variant == "no_da":
            da = du_tot
        else:
            da = _dw_shift_sum(du_tot, tmod,
                               [dwkf[k:k + 1, :] for k in range(K)],
                               K, P, T, -1)
            da = jnp.where(mask, da, 0.0)

        if variant in ("no_ddwk",):
            ddwk = jnp.zeros((Kp, C), jnp.float32) + jnp.sum(du_tot)
        else:
            rows_out = []
            for k in range(K):
                off = k - P
                rolled = _roll_rows(a, off)
                valid = (tmod >= -off) & (tmod < T - off)
                prod = jnp.where(valid, rolled, 0.0) * du_tot
                rows_out.append(jnp.sum(prod, axis=0, keepdims=True))
            rows_out += [jnp.zeros_like(rows_out[0])] * (Kp - K)
            ddwk = jnp.concatenate(rows_out, axis=0)
        ddwb = jnp.sum(du_tot, axis=0, keepdims=True)

        if variant == "only_ddwk":
            dx_ref[...] = jnp.zeros_like(dx_ref)
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            ddwk_ref[...] = ddwk
            ddwb_ref[...] = ddwb
            return

        dag = da * gate
        dgate = da * ag * gate * (1.0 - gate)
        dz = jnp.concatenate([dag, dgate], axis=1)
        cd = x_ref.dtype
        dz_c = dz.astype(cd)
        if variant == "no_dw1":
            dw1 = jnp.zeros((C, 2 * C), jnp.float32) + jnp.sum(dz)
        else:
            dw1 = jax.lax.dot_general(x2, dz_c, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        db1 = jnp.sum(dz, axis=0, keepdims=True)
        if variant == "no_dx":
            dx = dz[:, :C]
        else:
            dx = jax.lax.dot_general(dz_c, w1_ref[...],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dx_ref[...] = dx.astype(dx_ref.dtype)

        if variant == "no_accum":
            dw1_ref[...] = dw1
            db1_ref[...] = db1
            ddwk_ref[...] = ddwk
            ddwb_ref[...] = ddwb
            return

        @pl.when(i == 0)
        def _():
            dw1_ref[...] = dw1
            db1_ref[...] = db1
            ddwk_ref[...] = ddwk
            ddwb_ref[...] = ddwb

        @pl.when(i > 0)
        def _():
            dw1_ref[...] = dw1_ref[...] + dw1
            db1_ref[...] = db1_ref[...] + db1
            ddwk_ref[...] = ddwk_ref[...] + ddwk
            ddwb_ref[...] = ddwb_ref[...] + ddwb
    return kern


def run(variant):
    blk, w1s, v1, dwks, vc = _specs(Bb * Tp, C, Kp)
    f = jax.jit(lambda: pl.pallas_call(
        make_kernel(variant),
        grid=(B // Bb,),
        in_specs=[blk, w1s, v1, dwks, blk, blk, vc, vc],
        out_specs=[blk, w1s, v1, dwks, vc],
        out_shape=[jax.ShapeDtypeStruct((B * Tp, C), dt),
                   jax.ShapeDtypeStruct((C, 2 * C), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
                   jax.ShapeDtypeStruct((Kp, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
    )(x2, w1.astype(dt), b1.reshape(1, 2 * C).astype(dt), dwk_p, u,
      du, ds, dss))
    try:
        out = jax.block_until_ready(f())
        log(f"{variant:10s}: OK   dx mean={jnp.mean(jnp.abs(out[0].astype(jnp.float32))):.4f}")
    except Exception as e:
        log(f"{variant:10s}: FAIL {type(e).__name__}: {str(e)[:160]}")


which = sys.argv[1:] or ["full", "no_ddwk", "no_da", "no_dw1", "no_dx",
                         "no_accum", "only_ddwk"]
for v in which:
    run(v)
