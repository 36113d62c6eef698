"""Bisect the 143ms ARASR train step: fwd / fwd+grad / +optim / +shard_map."""
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
from speechain_tpu.train.state import init_train_state, make_arasr_step
from speechain_tpu.parallel.mesh import make_mesh, train_step_under_mesh

V, D, B, SECS, L = 1000, 256, 128, 8, 32
T = SECS * 16000
cfg = ARASRConfig(
    vocab_size=V, frontend=FrontendConfig(n_mels=80, preemphasis=0.97),
    feat_norm=FeatNormConfig(feat_dim=80),
    specaug=SpecAugmentConfig(freq_mask_width=27, time_mask_width=0.05),
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

def loss_fn(p, feat, k1, k2):
    outputs, _ = net.apply({"params": p, **muts}, feat, batch["feat_len"],
                           batch["text"], batch["text_len"], train=True,
                           epoch=batch["epoch"], axis_name=None,
                           rngs={"dropout": k1, "specaug": k2},
                           mutable=["norm_stats", "batch_stats", "losses"])
    loss, metrics = arasr_loss(outputs, batch["text"], batch["text_len"], cfg)
    return loss

def bench(name, step, *args, n=20):
    l = step(*args); float(np.asarray(l[0] if isinstance(l, tuple) else l))
    best = None
    for trial in range(2):
        a = args
        t1 = time.perf_counter()
        for i in range(n):
            out = step(*a)
            l = out[0] if isinstance(out, tuple) else out
            a = (a[0] + (0.0 * l).astype(a[0].dtype),) + a[1:]
        float(np.asarray(l))
        d = (time.perf_counter() - t1) / n
        best = d if best is None else min(best, d)
    log(f"{name}: {best*1e3:.2f} ms")

k1, k2 = jax.random.split(rng)
log("compiling fwd only")
jf = jax.jit(lambda feat: loss_fn(params, feat, k1, k2))
bench("full fwd only", jf, batch["feat"])

log("compiling fwd+grad")
jg = jax.jit(lambda feat: jax.grad(loss_fn)(params, feat, k1, k2)[
    "encoder"]["layer_0"]["front_feed_forward"]["in_layer"]["bias"][0])
bench("full fwd+grad", jg, batch["feat"])

log("compiling full step (jit, no shard_map)")
tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
state = init_train_state(variables, tx)
step_fn = make_arasr_step(net, cfg, tx, axis_name=None)
jstep = jax.jit(step_fn, donate_argnums=())
def run_plain(feat):
    b = dict(batch); b["feat"] = feat
    st, m = jstep(state, b, rng)
    return m["loss"]
bench("full step jit (no shard_map)", run_plain, batch["feat"])

log("compiling full step under shard_map mesh")
mesh = make_mesh(n_data=len(jax.devices()))
jsm = train_step_under_mesh(make_arasr_step(net, cfg, tx, axis_name="data"),
                            mesh, donate_state=False)
def run_sm(feat):
    b = dict(batch); b["feat"] = feat
    st, m = jsm(state, b, rng)
    return m["loss"]
bench("full step shard_map", run_sm, batch["feat"])
log("done")
