"""Decompose the conformer encoder step cost at B=128 with flash attention
on: which sub-module is the remaining time in? Chained value-copy protocol."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

from speechain_tpu.utils.hardware import enable_hardware_rng
enable_hardware_rng()

B, T, D = 128, 201, 256
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, D), dt)
lens = jnp.full((B,), T, jnp.int32)
mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, :]

def bench(name, jfn, *args, n=30):
    l, xx = jfn(*args)
    float(l)
    best = None
    for trial in range(2):
        t1 = time.perf_counter()
        a = args
        for i in range(n):
            l, xx = jfn(*a)
            a = (xx,) + args[1:] if len(args) else (xx,)
        float(l)
        d = (time.perf_counter() - t1) / n
        best = d if best is None else min(best, d)
    log(f"{name}: {best*1e3:.2f} ms")
    return best

def fwd_bwd(apply_fn, variables):
    def loss(params, xx):
        out = apply_fn({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, xx)
        return jnp.sum(out.astype(jnp.float32) ** 2)
    vg = jax.value_and_grad(loss)
    @jax.jit
    def step(xx):
        l, g = vg(variables["params"], xx)
        # chain: perturb x by the scalar so the next call depends on this one
        return l, xx + (0.0 * l).astype(dt)
    return step

# --- full 12-layer encoder ---
from speechain_tpu.nn.conformer import (ConformerEncoder, ConformerEncoderLayer,
                                        ConvolutionModule)
from speechain_tpu.nn.feed_forward import PositionwiseFeedForward
enc = ConformerEncoder(d_model=D, num_heads=4, num_layers=12, fdfwd_dim=4*D,
                       fdfwd_activation="GELU", dtype=dt)
ev = enc.init({"params": rng, "dropout": rng}, x, mask)
log("compiling encoder-12 fwd+bwd")
step_enc = fwd_bwd(lambda v, xx: enc.apply(v, xx, mask, train=True,
                                           rngs={"dropout": rng},
                                           mutable=["batch_stats"])[0][0], ev)
bench("encoder-12 fwd+bwd (flash)", step_enc, x)

os.environ["SPEECHAIN_DISABLE_FLASH_ATT"] = "1"
log("compiling encoder-12 fwd+bwd (xla att)")
step_enc2 = fwd_bwd(lambda v, xx: enc.apply(v, xx, mask, train=True,
                                            rngs={"dropout": rng},
                                            mutable=["batch_stats"])[0][0], ev)
bench("encoder-12 fwd+bwd (xla)", step_enc2, x)
del os.environ["SPEECHAIN_DISABLE_FLASH_ATT"]

# --- one conv module ---
conv = ConvolutionModule(channels=D, dtype=dt)
cv = conv.init({"params": rng}, x, train=True)
step_conv = fwd_bwd(lambda v, xx: conv.apply(v, xx, train=True,
                                             mutable=["batch_stats"])[0], cv)
log("compiling conv module")
bench("conv module fwd+bwd (x12 = ?)", step_conv, x)

# --- one FFN (macaron half) ---
ffn = PositionwiseFeedForward(d_model=D, fdfwd_dim=4*D,
                              fdfwd_activation="GELU", dtype=dt)
fv = ffn.init({"params": rng, "dropout": rng}, x, train=True)
step_ffn = fwd_bwd(lambda v, xx: ffn.apply(v, xx, train=True,
                                           rngs={"dropout": rng}), fv)
log("compiling ffn")
bench("ffn fwd+bwd (x24 = ?)", step_ffn, x)

# --- one full layer ---
posenc_dummy = jax.random.normal(rng, (1, 2*T-1, D), dt)
layer = ConformerEncoderLayer(d_model=D, num_heads=4, fdfwd_dim=4*D,
                              fdfwd_activation="GELU", dtype=dt)
lv = layer.init({"params": rng, "dropout": rng}, x, mask, posenc_dummy,
                train=False)
step_layer = fwd_bwd(lambda v, xx: layer.apply(
    v, xx, mask, posenc_dummy, train=True, return_attmat=False,
    rngs={"dropout": rng}, mutable=["batch_stats"])[0][0], lv)
log("compiling one layer")
bench("one layer fwd+bwd (x12 = ?)", step_layer, x)
log("done")
