"""Probe: do the fused attention kernels compile + run correctly on the
real TPU, and how fast vs the XLA path? Honest value-copy protocol."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
from speechain_tpu.ops.pallas_attention import (flash_attention,
                                                flash_relpos_attention)

B, H, T, Dh = 128, 4, 201, 64
L = 2 * T - 1
ks = jax.random.split(jax.random.PRNGKey(0), 8)
dt = jnp.bfloat16
q = jax.random.normal(ks[0], (B, H, T, Dh), dt)
k = jax.random.normal(ks[1], (B, H, T, Dh), dt)
v = jax.random.normal(ks[2], (B, H, T, Dh), dt)
g = jax.random.normal(ks[3], (B, H, T, Dh), dt)
ph = jax.random.normal(ks[4], (H, L, Dh), dt)
bu = jax.random.normal(ks[5], (H, Dh), jnp.float32) * 0.1
bv = jax.random.normal(ks[6], (H, Dh), jnp.float32) * 0.1
lens = jax.random.randint(ks[7], (B,), T // 2, T + 1)
km = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.int32)
seed = jnp.zeros((1,), jnp.int32)
scale = 1.0 / np.sqrt(256.0)

def ref_rel(q, k, v, ph, bu, bv):
    from speechain_tpu.nn.attention import rel_shift
    qu = q.astype(jnp.float32) + bu[None, :, None, :]
    qv = q.astype(jnp.float32) + bv[None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", qu.astype(q.dtype), k,
                    preferred_element_type=jnp.float32)
    bd = rel_shift(jnp.einsum("bhqd,hkd->bhqk", qv.astype(q.dtype), ph,
                              preferred_element_type=jnp.float32))
    s = (ac + bd) * scale
    s = jnp.where(km[:, None, None, :] > 0, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)

def loss_flash(q):
    return jnp.sum(flash_relpos_attention(q, k, v, ph, bu, bv, seed,
                                          scale, 0.0, km).astype(jnp.float32) * g.astype(jnp.float32))

def loss_ref(q):
    return jnp.sum(ref_rel(q, k, v, ph, bu, bv).astype(jnp.float32) * g.astype(jnp.float32))

jf = jax.jit(jax.value_and_grad(loss_flash))
jr = jax.jit(jax.value_and_grad(loss_ref))

log("compiling flash fwd+bwd")
lf, gf = jf(q); lf = float(lf)
log(f"flash ok: loss {lf:.1f}")
log("compiling ref fwd+bwd")
lr, gr = jr(q); lr = float(lr)
log(f"ref  ok: loss {lr:.1f}")
err = float(jnp.max(jnp.abs(gf.astype(jnp.float32) - gr.astype(jnp.float32))))
rel = abs(lf - lr) / abs(lr)
log(f"loss rel err {rel:.2e}; grad max abs err {err:.3e}")

# chained timing: feed grad back as q so each call depends on the last
def bench(jfn, name, n=30):
    qq = q
    best = None
    for trial in range(2):
        t1 = time.perf_counter()
        for i in range(n):
            l, gg = jfn(qq)
            qq = qq + (0.0 * l).astype(dt)  # chain through the scalar
        _ = float(l)
        dtm = (time.perf_counter() - t1) / n
        best = dtm if best is None else min(best, dtm)
        log(f"{name} trial {trial}: {dtm*1e3:.2f} ms/call")
    return best

bf = bench(jf, "flash rel fwd+bwd")
br = bench(jr, "xla   rel fwd+bwd")
log(f"SPEEDUP fwd+bwd: {br/bf:.2f}x  (flash {bf*1e3:.2f} ms, xla {br*1e3:.2f} ms)")
