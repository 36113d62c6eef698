"""Standalone repro of the BENCH_r03 fused-convmod TPU compile failure.

Compiles fused_conv_glu_dw fwd-only, then fwd+bwd (value_and_grad), at the
exact bench production dims (B=128, T=201, C=256, K=31, bf16), each in its
own try/except so we learn WHICH pass fails to lower.
"""
import os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPEECHAIN_FORCE_FUSED_CONVMOD", "1")

import jax, jax.numpy as jnp
t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

from speechain_tpu.ops.pallas_convmod import fused_conv_glu_dw

B, T, C, K = (int(x) for x in os.environ.get(
    "REPRO_DIMS", "128,201,256,31").split(","))
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, C), dt)
w1 = jax.random.normal(rng, (C, 2 * C), jnp.float32) * 0.05
b1 = jnp.zeros((2 * C,), jnp.float32)
dwk = jax.random.normal(rng, (K, C), jnp.float32) * 0.1
dwb = jnp.zeros((C,), jnp.float32)
log(f"backend={jax.default_backend()} dims B={B} T={T} C={C} K={K}")

def attempt(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        leaf = jax.tree_util.tree_leaves(out)[0]
        log(f"{name}: OK  first-leaf mean={jnp.mean(jnp.abs(leaf.astype(jnp.float32))):.4f}")
        return True
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__}: {str(e)[:500]}")
        if os.environ.get("REPRO_TB"):
            traceback.print_exc()
        return False

fwd = jax.jit(lambda *a: fused_conv_glu_dw(*a, 31 if K == 31 else K))
attempt("fwd", fwd, x, w1, b1, dwk, dwb)

def loss(x, w1, b1, dwk, dwb):
    u, s, ss = fused_conv_glu_dw(x, w1, b1, dwk, dwb, K)
    return (jnp.sum(u.astype(jnp.float32)) + jnp.sum(s) + jnp.sum(ss)) / u.size

vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
attempt("fwd+bwd", vg, x, w1, b1, dwk, dwb)
