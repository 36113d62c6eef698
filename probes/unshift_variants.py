"""The relpos BWD kernel spends ~0.6 ms/call (=40%) in two (Rp,P)x(P,P)
J-flip matmuls that implement lane reversal around the strided rotate
(111 GFLOP/call just to reverse lanes). Row-flip identity instead:
  unshift(ds) = flip0( roll_asc( flip0(dsp) ) )
with ds placed at column offset c2 = (c + T - Rp) mod 8 so the ascending
base stays a multiple of 8. Variants:
  jmat   — current: rev-lanes via right-J matmuls (baseline)
  rev0   — lax.rev on axis 0 (sublane flip) — native lowering?
  jleft  — left-J (Rp,Rp) matmuls (2.5x fewer FLOPs than right-J)
  iota0  — sublane flip via pltpu.roll with stride -1? (not supported;
           skipped)
Checks exactness against numpy and times each inside a realistic loop
(32 unshifts per grid step, 16 grid steps)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

T = 201
L = 2 * T - 1
P = -(-(2 * T + 8) // 128) * 128
Rp = -(-T // 8) * 8
c = (P - T + 1) % 8
N = 32                                   # unshifts per grid step
dt = jnp.bfloat16


def unshift_jmat(ds):
    base = P - T + 1 - c
    dsp = jnp.pad(ds, ((0, Rp - T), (0, P - T)))
    ia = lax.broadcasted_iota(jnp.int32, (P, P), 0)
    ib = lax.broadcasted_iota(jnp.int32, (P, P), 1)
    J = (ia + ib == P - 1).astype(ds.dtype)
    rev = lax.dot_general(dsp, J, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    rolled = pltpu.roll(rev, base, 1, stride=1, stride_axis=0)
    out = lax.dot_general(rolled, J, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    return out[:T]


def _row_flip_mat(dtype):
    ia = lax.broadcasted_iota(jnp.int32, (Rp, Rp), 0)
    ib = lax.broadcasted_iota(jnp.int32, (Rp, Rp), 1)
    return (ia + ib == Rp - 1).astype(dtype)


def unshift_rowflip(ds, flip):
    c2 = (c + T - Rp) % 8
    s0 = (c - c2 + T - Rp) % P
    dsp = jnp.pad(ds, ((0, Rp - T), (c2, P - T - c2)))
    X = flip(dsp)
    Y = pltpu.roll(X, s0, 1, stride=1, stride_axis=0)
    return flip(Y)[:T]


def unshift_rev0(ds):
    return unshift_rowflip(ds, lambda x: lax.rev(x, (0,)))


def unshift_jleft(ds):
    Jr = _row_flip_mat(ds.dtype)

    def flip(x):
        return lax.dot_general(Jr, x.astype(ds.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return unshift_rowflip(ds, flip)


FNS = dict(jmat=unshift_jmat, rev0=unshift_rev0, jleft=unshift_jleft)


def run(name):
    fn = FNS[name]

    def kern(x_ref, o_ref):
        for n in range(N):
            o_ref[n] = fn(x_ref[n]).astype(o_ref.dtype)

    x = jax.random.normal(jax.random.PRNGKey(0), (N, T, T), jnp.float32)

    def one(xx):
        return pl.pallas_call(
            kern, grid=(16,),
            in_specs=[pl.BlockSpec((N, T, T), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((N, T, P), lambda i: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, T, P), jnp.float32),
        )(xx.astype(dt).astype(jnp.float32))

    @jax.jit
    def chain(xx):
        o = one(xx)
        return o

    try:
        tc = time.perf_counter()
        out = jax.block_until_ready(chain(x))
        dt_c = time.perf_counter() - tc
    except Exception as e:  # noqa: BLE001
        log(f"{name:6s}: FAIL {type(e).__name__}: {str(e)[:140]}")
        return
    # exactness inside the true band [c, c+L)
    W = np.asarray(x.astype(dt).astype(jnp.float32))
    got = np.asarray(out)
    ref = np.zeros((T, L), np.float32)
    ok = True
    for n in (0, N - 1):
        ds = W[n]
        ref[:] = 0
        for i in range(T):
            for m in range(L):
                t = m - (T - 1) + i
                if 0 <= t < T:
                    ref[i, m] = ds[i, t]
        err = np.abs(got[n][:, c:c + L] - ref).max()
        ok &= err == 0
        if err > 0:
            log(f"{name:6s}: band mismatch {err:.2e} at n={n}")
    best = None
    for trial in range(3):
        t1 = time.perf_counter()
        o = chain(x + np.float32(trial))
        float(jnp.sum(o[0, 0, :1]))
        d = time.perf_counter() - t1
        best = d if best is None else min(best, d)
    log(f"{name:6s}: {best*1e3/16:7.3f} ms per {N}-unshift grid step  "
        f"exact={ok}  (compile {dt_c:.0f}s)")


for name in (sys.argv[1:] or ["jmat", "rev0", "jleft"]):
    run(name)
