"""Time XLA formulations of the depthwise weight gradient
ddwk[k,c] = sum_{b,t} ap[b, t+k-P, c] * du[b, t, c]  (K=31, bench dims).

  slices   — current: stack of K shifted multiply-reduces (fusion.747)
  convvjp  — jax.vjp of lax.conv_general_dilated(feature_group_count=C):
             XLA's own conv-backward-filter emitter
  bf16     — slices formulation with bf16 inputs
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

B, T, C, K = 128, 201, 256, 31
P = (K - 1) // 2
rng = jax.random.PRNGKey(0)
a3 = jax.random.normal(rng, (B, T, C), jnp.float32)
du = jax.random.normal(rng, (B, T, C), jnp.float32)
dwk = jnp.zeros((K, C), jnp.float32)


def slices(a3, du):
    ap = jnp.pad(a3, ((0, 0), (P, K - 1 - P), (0, 0)))
    return jnp.stack(
        [jnp.sum(ap[:, k:k + T] * du, axis=(0, 1)) for k in range(K)])


def convvjp(a3, du):
    def dw_fwd(w):
        return lax.conv_general_dilated(
            a3, w.reshape(K, 1, C), window_strides=(1,),
            padding=[(P, K - 1 - P)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C)
    _, vjp = jax.vjp(dw_fwd, dwk)
    return vjp(du)[0].reshape(K, C)


def bf16(a3, du):
    return slices(a3.astype(jnp.bfloat16),
                  du.astype(jnp.bfloat16)).astype(jnp.float32)


def timeit(name, fn):
    @jax.jit
    def chain(x):
        acc = jnp.zeros((K, C), jnp.float32)
        for i in range(10):
            acc = acc + fn(x + acc[0, 0] * 1e-9, du)
        return acc
    try:
        ref = jax.block_until_ready(chain(a3))
    except Exception as e:  # noqa: BLE001
        log(f"{name:8s}: FAIL {type(e).__name__}: {str(e)[:120]}")
        return None
    best = None
    for trial in range(3):
        t1 = time.perf_counter()
        out = chain(a3 + jnp.float32(trial * 1e-7))
        float(out[0, 0])
        d = (time.perf_counter() - t1) / 10
        best = d if best is None else min(best, d)
    log(f"{name:8s}: {best*1e3:7.3f} ms/grad  val={float(ref[0,0]):.3f}")
    return best


import numpy as np
x = np.asarray(slices(a3, du))
y = np.asarray(convvjp(a3, du))
log(f"convvjp vs slices max abs err: {abs(x-y).max():.2e} (scale {abs(x).max():.1f})")
timeit("slices", slices)
timeit("convvjp", convvjp)
timeit("bf16", bf16)
