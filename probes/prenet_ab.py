"""A/B the fused conv2d-prenet core vs the unfused XLA path on-chip at
bench dims (mel (128, 801, 80), C=256): fwd+bwd wall time per call and a
numeric cross-check."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

from speechain_tpu.nn.prenets import Conv2dPrenet

B, T, F, C = 128, 801, 80, 256
rng = jax.random.PRNGKey(0)
feat = jax.random.normal(rng, (B, T, F), jnp.float32) * 0.3
flen = jnp.full((B,), T, jnp.int32)

net = Conv2dPrenet(conv_dims=[C, C], conv_kernel=3, conv_stride=2,
                   conv_padding=0, conv_batchnorm=True,
                   conv_activation="LeakyReLU", lnr_dims=C,
                   dtype=jnp.bfloat16, bn_axis_name=None)
variables = net.init({"params": rng}, feat, flen, train=False)
params = variables["params"]
bstats = variables["batch_stats"]


def make_step():
    def loss(p, x):
        (out, _), _ = net.apply({"params": p, "batch_stats": bstats},
                                x, flen, train=True,
                                mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    grad = jax.value_and_grad(loss)

    @jax.jit
    def chain(p, x):
        tot = 0.0
        for i in range(6):
            v, g = grad(p, x + jnp.float32(i) * 1e-6)
            tot = tot + v
            p = jax.tree_util.tree_map(
                lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
        return tot, p

    return chain


def run(tag):
    chain = make_step()
    tc = time.perf_counter()
    try:
        v, p2 = chain(params, feat)
        v = float(v)
    except Exception as e:  # noqa: BLE001
        log(f"{tag:8s}: FAIL {type(e).__name__}: {str(e)[:180]}")
        return None
    log(f"{tag:8s}: compiled+ran in {time.perf_counter()-tc:.1f}s "
        f"loss6={v:.4f}")
    best = None
    for _ in range(3):
        t1 = time.perf_counter()
        vv, _ = chain(params, feat)
        float(vv)
        d = (time.perf_counter() - t1) / 6
        best = d if best is None else min(best, d)
    log(f"{tag:8s}: {best*1e3:7.2f} ms per fwd+bwd  loss6={float(vv):.4f}")
    return v


os.environ["SPEECHAIN_FORCE_FUSED_PRENET"] = "1"
on = run("fused")
del os.environ["SPEECHAIN_FORCE_FUSED_PRENET"]
off = run("unfused")
if on is not None and off is not None:
    log(f"loss rel diff: {abs(on-off)/max(abs(off),1e-9):.2e}")
