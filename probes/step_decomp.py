"""Decompose the NON-encoder parts of the ARASR train step at B=128."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)
from speechain_tpu.utils.hardware import enable_hardware_rng
enable_hardware_rng()

B, V, D = 128, 1000, 256
T_wav, T_frames, T_sub, L = 128000, 801, 201, 32
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)

def bench(name, step, *args, n=20):
    l, xx = step(*args); float(l)
    best = None
    for trial in range(2):
        a = args
        t1 = time.perf_counter()
        for i in range(n):
            l, xx = step(*a)
            a = (xx,) + a[1:]
        float(l)
        d = (time.perf_counter() - t1) / n
        best = d if best is None else min(best, d)
    log(f"{name}: {best*1e3:.2f} ms")

# 1) frontend + feat_norm + specaug fwd (+bwd through nothing: input is raw)
from speechain_tpu.ops.frontend import FrontendConfig, compute_logmel
fc = FrontendConfig(n_mels=80, preemphasis=0.97)
wav = jax.random.normal(rng, (B, T_wav)) * 0.1
wl = jnp.full((B,), T_wav, jnp.int32)
@jax.jit
def fe(w):
    feat, flen = compute_logmel(w, wl, fc)[:2]
    l = jnp.sum(feat.astype(jnp.float32) ** 2)
    return l, w + (0.0 * l).astype(w.dtype)
log("compiling frontend")
bench("frontend fwd", fe, wav)

# 2) conv2d prenet fwd+bwd
from speechain_tpu.nn.prenets import Conv2dPrenet
pre = Conv2dPrenet(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                   conv_batchnorm=True, conv_activation="LeakyReLU",
                   lnr_dims=D, dtype=dt)
feat = jax.random.normal(rng, (B, T_frames, 80), dt)
pv = pre.init({"params": rng, "dropout": rng}, feat, jnp.full((B,), T_frames))
def prenet_loss(params, xx):
    out = pre.apply({"params": params, **{k: v for k, v in pv.items() if k != "params"}},
                    xx, jnp.full((B,), T_frames), train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])[0][0]
    return jnp.sum(out.astype(jnp.float32) ** 2)
vg = jax.value_and_grad(prenet_loss)
@jax.jit
def pstep(xx):
    l, g = vg(pv["params"], xx)
    return l, xx + (0.0 * l).astype(dt)
log("compiling prenet")
bench("conv2d prenet fwd+bwd", pstep, feat)

# 3) CTC loss fwd+bwd on (B, T_sub, V)
from speechain_tpu.train.criteria import ctc_loss
logits = jax.random.normal(rng, (B, T_sub, V), jnp.float32)
llen = jnp.full((B,), T_sub, jnp.int32)
labels = jax.random.randint(rng, (B, L), 2, V)
llab = jnp.full((B,), L, jnp.int32)
def closs(lg):
    return jnp.mean(ctc_loss(lg, llen, labels, llab))
cvg = jax.value_and_grad(closs)
@jax.jit
def cstep(lg):
    l, g = cvg(lg)
    return l, lg + 0.0 * l
log("compiling ctc")
bench("ctc loss fwd+bwd", cstep, logits)

# 4) decoder (6 layers, L=32) + CE fwd+bwd
from speechain_tpu.nn.transformer import TransformerDecoder
from speechain_tpu.nn.prenets import EmbedPrenet
dec = TransformerDecoder(d_model=D, num_heads=4, num_layers=6,
                         fdfwd_dim=4*D, fdfwd_activation="GELU", dtype=dt)
enc_feat = jax.random.normal(rng, (B, T_sub, D), dt)
tgt = jax.random.normal(rng, (B, L, D), dt)
tmask = jnp.ones((B, 1, L), bool)
smask = jnp.ones((B, 1, T_sub), bool)
dv = dec.init({"params": rng, "dropout": rng}, tgt, enc_feat, tmask, smask)
def dloss(params, xx):
    out = dec.apply({"params": params}, xx, enc_feat, tmask, smask,
                    train=True, rngs={"dropout": rng})[0]
    return jnp.sum(out.astype(jnp.float32) ** 2)
dvg = jax.value_and_grad(dloss)
@jax.jit
def dstep(xx):
    l, g = dvg(dv["params"], xx)
    return l, xx + (0.0 * l).astype(dt)
log("compiling decoder")
bench("decoder-6 fwd+bwd", dstep, tgt)

# 5) CE + softmax over (B, L, V) — cheap check
log("done")
