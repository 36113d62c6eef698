"""Microbenchmark the rel-shift roll in isolation, plus layout variants.

The fwd-kernel bisect attributes ~0.66 ms/call to ONE strided lane-rotate
of a (208, 512) f32 band per (g, h) — suspiciously slow. Variants:
  lane      — current: pltpu.roll(axis=1, stride=1, stride_axis=0)
  laneconcat— one (208, 2048) rotate for all 4 heads at once
  sublane   — transposed band (512, 208): roll axis=0, stride_axis=1
  log2      — static roll+select decomposition (8 steps)
  matpair   — two J-flip matmuls only (bwd unshift overhead floor)
Each variant runs inside a minimal kernel that loads the band, rolls,
and writes the (T, T) slice — so the measured delta vs `copy` (load +
slice + store, no roll) isolates the roll cost.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

T = 201
L = 2 * T - 1
P = -(-(2 * T + 8) // 128) * 128         # 512
Rp = -(-T // 8) * 8                      # 208
c = (P - T + 1) % 8
base = P - T + 1 - c
N_BANDS = 32                             # mimic G*H bands per grid step
rng = jax.random.PRNGKey(0)
Wp = jax.random.normal(rng, (N_BANDS, Rp, P), jnp.float32)
WpT = jnp.transpose(Wp, (0, 2, 1)).copy()


def k_copy(w_ref, o_ref):
    for n in range(N_BANDS):
        o_ref[n] = w_ref[n][:T, :T]


def k_lane(w_ref, o_ref):
    for n in range(N_BANDS):
        o_ref[n] = pltpu.roll(w_ref[n], base, 1, stride=1,
                              stride_axis=0)[:T, :T]


def k_laneconcat(w_ref, o_ref):
    # one wide rotate over head-concatenated lanes
    wide = jnp.concatenate([w_ref[n] for n in range(N_BANDS)], axis=1)
    rolled = pltpu.roll(wide, base, 1, stride=1, stride_axis=0)
    for n in range(N_BANDS):
        o_ref[n] = rolled[:T, n * P:n * P + T]


def k_sublane(w_ref, o_ref):
    for n in range(N_BANDS):
        r = pltpu.roll(w_ref[n], base, 0, stride=1, stride_axis=1)
        o_ref[n] = r[:T, :T]


def k_log2(w_ref, o_ref):
    rows = lax.broadcasted_iota(jnp.int32, (Rp, 1), 0)
    amt = base + rows
    for n in range(N_BANDS):
        W = w_ref[n]
        for kbit in range(9):
            step = 1 << kbit
            rolled = pltpu.roll(W, step, 1)
            take = ((amt >> kbit) & 1) == 1
            W = jnp.where(take, rolled, W)
        o_ref[n] = W[:T, :T]


def k_matpair(w_ref, o_ref):
    ia = lax.broadcasted_iota(jnp.int32, (P, P), 0)
    ib = lax.broadcasted_iota(jnp.int32, (P, P), 1)
    J = (ia + ib == P - 1).astype(jnp.float32)
    for n in range(N_BANDS):
        rev = lax.dot_general(w_ref[n], J, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        out = lax.dot_general(rev, J, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        o_ref[n] = out[:T, :T]


KERNS = dict(copy=k_copy, lane=k_lane, laneconcat=k_laneconcat,
             log2=k_log2, matpair=k_matpair)


def run(name):
    if name == "sublane":
        inp, shape = WpT, (N_BANDS, P, Rp)
        kern = k_sublane
        ospec = pl.BlockSpec((N_BANDS, P, Rp), lambda i: (0, 0, 0))
        oshape = jax.ShapeDtypeStruct((N_BANDS, P, Rp), jnp.float32)

        def kern(w_ref, o_ref):  # noqa: F811
            for n in range(N_BANDS):
                r = pltpu.roll(w_ref[n], base, 0, stride=1, stride_axis=1)
                o_ref[n, :T, :T] = r[:T, :T]
    else:
        inp = Wp
        kern = KERNS[name]
        ospec = pl.BlockSpec((N_BANDS, T, T), lambda i: (0, 0, 0))
        oshape = jax.ShapeDtypeStruct((N_BANDS, T, T), jnp.float32)

        def kern2(w_ref, o_ref, k=kern):
            k(w_ref, o_ref)
        kern = kern2

    def one(w):
        return pl.pallas_call(
            kern, grid=(1,),
            in_specs=[pl.BlockSpec(w.shape, lambda i: (0, 0, 0))],
            out_specs=ospec, out_shape=oshape,
        )(w)

    @jax.jit
    def chain(w):
        for _ in range(10):
            o = one(w)
            w = w + (o[0, 0, 0] * 1e-12) if name == "sublane" else \
                w.at[:, :T, :T].add(o * 1e-12)
        return w

    try:
        tc = time.perf_counter()
        out = jax.block_until_ready(chain(inp))
        dt_c = time.perf_counter() - tc
    except Exception as e:  # noqa: BLE001
        log(f"{name:10s}: FAIL {type(e).__name__}: {str(e)[:140]}")
        return
    best = None
    for trial in range(3):
        t1 = time.perf_counter()
        o = chain(inp + jnp.float32(trial * 1e-9))
        float(jnp.sum(o[0, 0, :1]))
        d = (time.perf_counter() - t1) / 10
        best = d if best is None else min(best, d)
    log(f"{name:10s}: {best*1e3:7.3f} ms / {N_BANDS} bands"
        f"  (compile {dt_c:.0f}s)")


for name in (sys.argv[1:] or ["copy", "lane", "sublane", "laneconcat",
                              "log2", "matpair"]):
    run(name)
