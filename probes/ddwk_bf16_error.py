"""Measure the on-TPU ddwk error from the bf16 GLU-activation export.

ADVICE r4 (pallas_convmod.py:178): the convmod backward exports the
recomputed GLU activation ``a`` in the compute dtype (bf16) on TPU so
the XLA-side depthwise weight-gradient reduce moves half the bytes; the
CPU test suite runs interpret mode (f32 export) and cannot observe the
precision cost. This probe records that baseline on the real chip at
the bench config's conv-module dims (C=256, K=31, bf16 compute):

  err(kernel)   = ddwk[fused kernel, bf16 export] vs f32-XLA ground truth
  err(xla bf16) = ddwk[plain-XLA autodiff, bf16 forward] vs same truth

If err(kernel) ~ err(xla bf16), the export adds nothing beyond the
bf16-forward noise every path already carries. Run:

  python probes/ddwk_bf16_error.py          # on the TPU-attached host
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from speechain_tpu.ops.pallas_convmod import fused_conv_glu_dw

B, T, C, K = 16, 200, 256, 31


def ref_impl(x, w1, b1, dwk, dwb):
    z = x @ w1 + b1.astype(x.dtype)
    a = z[..., :C] * jax.nn.sigmoid(z[..., C:])
    P = (K - 1) // 2
    ap = jnp.pad(a, ((0, 0), (P, K - 1 - P), (0, 0)))
    u = sum(ap[:, k:k + T, :] * dwk[k].astype(x.dtype) for k in range(K))
    u = u + dwb.astype(x.dtype)
    uf = u.astype(jnp.float32)
    return u, jnp.sum(uf, (0, 1)), jnp.sum(uf * uf, (0, 1))


def loss_of(fn, dtype):
    cw = jax.random.normal(jax.random.PRNGKey(9), (B, T, C), jnp.float32)

    def loss(x, w1, b1, dwk, dwb):
        u, s, ss = fn(x.astype(dtype), w1.astype(dtype), b1, dwk, dwb)
        return (jnp.sum(u.astype(jnp.float32) * cw)
                + 0.3 * jnp.sum(s) + 0.07 * jnp.sum(ss))

    return loss


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, T, C), jnp.float32)
    w1 = jax.random.normal(ks[1], (C, 2 * C)) * 0.08
    b1 = jax.random.normal(ks[2], (2 * C,)) * 0.1
    dwk = jax.random.normal(ks[3], (K, C)) * 0.2
    dwb = jax.random.normal(ks[4], (C,)) * 0.1
    args = (x, w1, b1, dwk, dwb)

    grad = lambda l: jax.jit(jax.grad(l, argnums=3))  # noqa: E731
    truth = np.asarray(grad(loss_of(ref_impl, jnp.float32))(*args))
    scale = np.abs(truth).max()

    def err(name, l):
        g = np.asarray(grad(l)(*args), np.float32)
        rel = np.abs(g - truth).max() / scale
        print(f"{name:>28s}: max|ddwk err| / max|ddwk| = {rel:.3e}")
        return rel

    print(f"backend={jax.default_backend()} dims B={B} T={T} C={C} K={K}"
          f"  max|ddwk|={scale:.3f}")
    kfn = lambda *a: fused_conv_glu_dw(*a, K)  # noqa: E731
    ek = err("fused kernel (bf16 export)", loss_of(kfn, jnp.bfloat16))
    ex = err("plain XLA bf16 forward", loss_of(ref_impl, jnp.bfloat16))
    print(f"export-attributable excess: {max(0.0, ek - ex):.3e}"
          f"  (ratio kernel/xla = {ek / ex:.2f})")


if __name__ == "__main__":
    main()
