"""Bisect 2: augmentation/rng cost and true optimizer cost."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)
from speechain_tpu.utils.hardware import enable_hardware_rng
enable_hardware_rng()

from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet, arasr_loss
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig
from speechain_tpu.ops.specaug import SpecAugmentConfig
from speechain_tpu.train.optim import build_optimizer

V, D, B, SECS, L = 1000, 256, 128, 8, 32
T = SECS * 16000
def mkcfg(specaug=True):
    return ARASRConfig(
        vocab_size=V, frontend=FrontendConfig(n_mels=80, preemphasis=0.97),
        feat_norm=FeatNormConfig(feat_dim=80),
        specaug=SpecAugmentConfig(freq_mask_width=27, time_mask_width=0.05)
            if specaug else None,
        enc_prenet=dict(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                        conv_batchnorm=True, conv_activation="LeakyReLU",
                        lnr_dims=D),
        encoder_type="conformer",
        encoder=dict(d_model=D, num_heads=4, num_layers=12, fdfwd_dim=4*D,
                     fdfwd_activation="GELU"),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=6, fdfwd_dim=4*D,
                     fdfwd_activation="GELU"),
        ctc_weight=0.3, label_smoothing=0.1, dtype=jnp.bfloat16)
cfg = mkcfg()
net = ARASRNet(cfg=cfg)
rng = jax.random.PRNGKey(0)
batch = dict(feat=jax.random.normal(rng, (B, T, 1)) * 0.1,
             feat_len=jnp.full((B,), T, jnp.int32),
             text=jax.random.randint(rng, (B, L), 2, V).astype(jnp.int32),
             text_len=jnp.full((B,), L, jnp.int32),
             epoch=jnp.zeros((), jnp.int32))
variables = jax.jit(lambda r, f, fl, t, tl: net.init(
    {"params": r, "dropout": r, "specaug": r}, f, fl, t, tl, train=False))(
    rng, batch["feat"], batch["feat_len"], batch["text"], batch["text_len"])
jax.block_until_ready(variables)
params = variables["params"]
muts = {k: v for k, v in variables.items() if k != "params"}
k1, k2 = jax.random.split(rng)

def loss_fn(p, feat, train):
    if train:
        outputs, _ = net.apply({"params": p, **muts}, feat, batch["feat_len"],
                               batch["text"], batch["text_len"], train=True,
                               epoch=batch["epoch"], axis_name=None,
                               rngs={"dropout": k1, "specaug": k2},
                               mutable=["norm_stats", "batch_stats", "losses"])
    else:
        outputs = net.apply({"params": p, **muts}, feat, batch["feat_len"],
                            batch["text"], batch["text_len"], train=False,
                            epoch=batch["epoch"], axis_name=None,
                            rngs={"dropout": k1, "specaug": k2})
    return arasr_loss(outputs, batch["text"], batch["text_len"], cfg)[0]

def bench(name, step, *args, n=20):
    l = step(*args); float(np.asarray(l))
    best = None
    for trial in range(2):
        a = args
        t1 = time.perf_counter()
        for i in range(n):
            l = step(*a)
            a = (a[0] + (0.0 * l).astype(a[0].dtype),) + a[1:]
        float(np.asarray(l))
        d = (time.perf_counter() - t1) / n
        best = d if best is None else min(best, d)
    log(f"{name}: {best*1e3:.2f} ms")

log("compile fwd eval (no dropout/specaug)")
je = jax.jit(lambda feat: loss_fn(params, feat, False))
bench("fwd eval-mode", je, batch["feat"])

log("compile fwd+FULL grads (global norm output)")
def full_grads(feat):
    g = jax.grad(loss_fn)(params, feat, True)
    return sum(jnp.sum(x.astype(jnp.float32) ** 2)
               for x in jax.tree_util.tree_leaves(g))
jg = jax.jit(full_grads)
bench("fwd+grad FULL", jg, batch["feat"])

log("compile grads+adam update")
tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
opt_state = tx.init(params)
import optax
def stepfull(feat):
    g = jax.grad(loss_fn)(params, feat, True)
    up, no = tx.update(g, opt_state, params)
    p2 = optax.apply_updates(params, up)
    return jax.tree_util.tree_leaves(p2)[0].astype(jnp.float32).sum()
js = jax.jit(stepfull)
bench("fwd+grad+adam", js, batch["feat"])
log("done")
