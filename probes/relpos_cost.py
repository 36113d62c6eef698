"""Where do the relpos kernel's 1.74 ms/layer go? Time the REAL fwd+bwd
kernels (ops/pallas_attention.py) at bench dims with dropout on/off, and
the fwd alone, chained with value-copy barriers."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from speechain_tpu.ops.pallas_attention import flash_relpos_attention as relpos_flash_attention

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

B, T, D, H = 128, 201, 256, 4
L = 2 * T - 1
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (B, T, D), dt)
k = jax.random.normal(rng, (B, T, D), dt)
v = jax.random.normal(rng, (B, T, D), dt)
ph = jax.random.normal(rng, (L, D), dt)
bu = (jax.random.normal(rng, (1, D), jnp.float32) * 0.1)
bv = (jax.random.normal(rng, (1, D), jnp.float32) * 0.1)
km = jnp.ones((B, T), jnp.int32)
seed = jnp.zeros((1,), jnp.int32)
scale = 0.0625
N = 30


def time_fn(name, fn, *args):
    """Chain N_INNER applications INSIDE one jit (per-call dispatch gaps
    through the link would otherwise dominate), value-copy barrier."""
    N_INNER = 10

    @jax.jit
    def chain(qq):
        for _ in range(N_INNER):
            qq = fn(qq, *args[1:])
        return qq

    out = jax.block_until_ready(chain(args[0]))
    best = None
    for trial in range(2):
        t1 = time.perf_counter()
        o = args[0]
        for i in range(4):
            o = chain(o + jnp.bfloat16(1e-6))
        float(jnp.sum(o[0, 0, :1].astype(jnp.float32)))
        d = (time.perf_counter() - t1) / (4 * N_INNER)
        best = d if best is None else min(best, d)
    log(f"{name:22s}: {best*1e3:7.3f} ms/call")
    return best


def fwd(rate):
    return lambda qq: relpos_flash_attention(
        qq, k, v, ph, bu, bv, seed, scale, H, rate, km)


def vjp(rate):
    def loss(qq):
        o = relpos_flash_attention(qq, k, v, ph, bu, bv, seed, scale,
                                   H, rate, km)
        return jnp.sum(o.astype(jnp.float32)) * 1e-6
    def step(qq):
        g = jax.grad(loss)(qq)
        return qq + g.astype(qq.dtype) * jnp.bfloat16(1e-6)
    return step


time_fn("fwd rate=0.1", fwd(0.1), q)
time_fn("fwd rate=0.0", fwd(0.0), q)
time_fn("fwd+bwd rate=0.1", vjp(0.1), q)
time_fn("fwd+bwd rate=0.0", vjp(0.0), q)
