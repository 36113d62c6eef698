import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from speechain_tpu.ops.pallas_attention import flash_relpos_attention
from speechain_tpu.nn.attention import rel_shift

def check(T, B=8, H=4, Dh=64):
    D = H * Dh
    rng = jax.random.PRNGKey(T)
    ks = jax.random.split(rng, 6)
    q = jax.random.normal(ks[0], (B, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, D), jnp.float32)
    ph = jax.random.normal(ks[3], (2 * T - 1, D), jnp.float32)
    bu = jax.random.normal(ks[4], (1, D), jnp.float32) * 0.1
    bv = jax.random.normal(ks[5], (1, D), jnp.float32) * 0.1
    km = (jnp.arange(T)[None, :] < jnp.full((B, 1), T)).astype(jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    scale = 1.0 / np.sqrt(D)

    def g(qq):
        return jnp.sum(flash_relpos_attention(qq, k, v, ph, bu, bv, seed,
                                              scale, H, 0.0, km) ** 2)
    val, grad = jax.jit(jax.value_and_grad(g))(q)

    # reference in (B,H,T,Dh)
    def split(x): return x.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    phh = ph.reshape(2*T-1, H, Dh).transpose(1, 0, 2)
    def ref(qq):
        qh, kh, vh = split(qq), split(k), split(v)
        qu = qh + bu.reshape(H, Dh)[None, :, None, :]
        qv = qh + bv.reshape(H, Dh)[None, :, None, :]
        ac = jnp.einsum("bhqd,bhkd->bhqk", qu, kh)
        bd = rel_shift(jnp.einsum("bhqd,hkd->bhqk", qv, phh))
        p = jax.nn.softmax((ac + bd) * scale, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return jnp.sum(out ** 2)
    rval, rgrad = jax.jit(jax.value_and_grad(ref))(q)
    with jax.default_matmul_precision("highest"):
        hval, hgrad = jax.jit(jax.value_and_grad(ref))(q)
    verr = abs(float(val) - float(hval)) / abs(float(hval))
    gerr = float(jnp.max(jnp.abs(grad - hgrad)) / jnp.max(jnp.abs(hgrad)))
    # noise floor: the default-precision reference vs itself at highest
    nerr = float(jnp.max(jnp.abs(rgrad - hgrad)) / jnp.max(jnp.abs(hgrad)))
    print(f"T={T}: val rel err {verr:.2e}  grad rel err {gerr:.2e} "
          f"(default-precision ref noise floor {nerr:.2e})", flush=True)
    assert verr < 1e-4 and gerr < 3 * max(nerr, 1e-4), (T, verr, gerr, nerr)

import sys
for T in [int(a) for a in sys.argv[1:]] or (200, 201, 128, 137):
    check(T)
print("ALL OK")
