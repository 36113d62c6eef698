"""Narrow the ddwk failure: concat? reduce count? rolls? combination?

Variants (all ONLY compute ddwk, zeros elsewhere):
  base        — 31x(roll+mask+mul+reduce) + concat(32)      [expected FAIL]
  where_acc   — same but accumulate rows into (Kp,C) via iota-where, no concat
  concat8     — only 8 taps + concat(8 + pad)               [count?]
  noroll      — no rolls (mask+mul+reduce)x31 + concat       [rolls?]
  onered      — 31x(roll+mask+mul) summed into ONE reduce    [reduce count?]
  matmul      — ddwk via dot_general( onehot shifts )        [alt formulation]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.ops.pallas_convmod import (
    _tmod, _roll_rows, _specs, _pad_flatten, _pick_bb)

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

B, T, C, K = 8, 201, 256, 31
P = (K - 1) // 2
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, C), dt)
mult = 16
x2, _, Tp = _pad_flatten(x, mult)
Kp = -(-K // 8) * 8
Bb = _pick_bb(B, Tp, C)
du = jax.random.normal(rng, (B * Tp, C), dt)


def make_kernel(variant):
    def kern(a_ref, du_ref, ddwk_ref):
        rows = a_ref.shape[0]
        tmod = _tmod(rows, Tp)
        a = a_ref[...].astype(jnp.float32)
        du_tot = du_ref[...].astype(jnp.float32)
        nK = 8 if variant == "concat8" else K

        if variant == "onered":
            acc = jnp.zeros_like(a)
            for k in range(nK):
                off = k - P
                rolled = _roll_rows(a, off)
                valid = (tmod >= -off) & (tmod < T - off)
                acc = acc + jnp.where(valid, rolled, 0.0) * du_tot
            row = jnp.sum(acc, axis=0, keepdims=True)
            ddwk_ref[...] = jnp.broadcast_to(row, (Kp, C))
            return

        if variant == "where_acc":
            kidx = jax.lax.broadcasted_iota(jnp.int32, (Kp, 1), 0)
            acc = jnp.zeros((Kp, C), jnp.float32)
            for k in range(nK):
                off = k - P
                rolled = _roll_rows(a, off)
                valid = (tmod >= -off) & (tmod < T - off)
                prod = jnp.where(valid, rolled, 0.0) * du_tot
                row = jnp.sum(prod, axis=0, keepdims=True)
                acc = jnp.where(kidx == k, row, acc)
            ddwk_ref[...] = acc
            return

        rows_out = []
        for k in range(nK):
            off = k - P
            if variant == "noroll":
                rolled = a
            else:
                rolled = _roll_rows(a, off)
            valid = (tmod >= -off) & (tmod < T - off)
            prod = jnp.where(valid, rolled, 0.0) * du_tot
            rows_out.append(jnp.sum(prod, axis=0, keepdims=True))
        rows_out += [jnp.zeros_like(rows_out[0])] * (Kp - nK)
        ddwk_ref[...] = jnp.concatenate(rows_out, axis=0)
    return kern


def run(variant):
    blk, _, _, dwks, _ = _specs(Bb * Tp, C, Kp)
    f = jax.jit(lambda: pl.pallas_call(
        make_kernel(variant),
        grid=(B // Bb,),
        in_specs=[blk, blk],
        out_specs=dwks,
        out_shape=jax.ShapeDtypeStruct((Kp, C), jnp.float32),
    )(x2, du))
    try:
        out = jax.block_until_ready(f())
        log(f"{variant:10s}: OK   mean={jnp.mean(jnp.abs(out)):.4f}")
    except Exception as e:
        log(f"{variant:10s}: FAIL {type(e).__name__}: {str(e)[:160]}")


which = sys.argv[1:] or ["base", "where_acc", "concat8", "noroll", "onered"]
for v in which:
    run(v)
