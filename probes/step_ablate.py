"""Ablate the bench train step to localize the remaining per-step cost.

Times the full B=128 conformer-small step and variants with one part
removed/shrunk; the deltas attribute per-part cost. Honest protocol:
chained steps + final-loss host copy (docs/BENCHMARKS.md methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/speechain_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_T0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter() - _T0:7.1f}s] {m}", flush=True)


from speechain_tpu.utils.hardware import enable_hardware_rng
enable_hardware_rng()

from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig
from speechain_tpu.ops.specaug import SpecAugmentConfig
from speechain_tpu.parallel.mesh import make_mesh, train_step_under_mesh
from speechain_tpu.train.optim import build_optimizer
from speechain_tpu.train.state import init_train_state, make_arasr_step

V, D = 1000, 256
B, SECS, L = 128, 8, 32
T = SECS * 16000
N = int(os.environ.get("ABLATE_CHAIN_STEPS", "20"))


def base_cfg(**over):
    kw = dict(
        vocab_size=V,
        frontend=FrontendConfig(n_mels=80, preemphasis=0.97),
        feat_norm=FeatNormConfig(feat_dim=80),
        specaug=SpecAugmentConfig(freq_mask_width=27, time_mask_width=0.05),
        enc_prenet=dict(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                        conv_batchnorm=True, conv_activation="LeakyReLU",
                        lnr_dims=D),
        encoder_type="conformer",
        encoder=dict(d_model=D, num_heads=4, num_layers=12, fdfwd_dim=4 * D,
                     fdfwd_activation="GELU"),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=6, fdfwd_dim=4 * D,
                     fdfwd_activation="GELU"),
        ctc_weight=0.3,
        label_smoothing=0.1,
        dtype=jnp.bfloat16,
    )
    kw.update(over)
    return ARASRConfig(**kw)


rng = jax.random.PRNGKey(0)
batch = dict(
    feat=jax.random.normal(rng, (B, T, 1)) * 0.1,
    feat_len=jnp.full((B,), T, jnp.int32),
    text=jax.random.randint(rng, (B, L), 2, V).astype(jnp.int32),
    text_len=jnp.full((B,), L, jnp.int32),
    epoch=jnp.zeros((), jnp.int32),
)
mesh = make_mesh(n_data=len(jax.devices()))
results = {}


def run(name, cfg):
    net = ARASRNet(cfg=cfg)
    variables = jax.jit(
        lambda r, f, fl, t, tl: net.init(
            {"params": r, "dropout": r, "specaug": r}, f, fl, t, tl,
            train=False)
    )(rng, batch["feat"], batch["feat_len"], batch["text"],
      batch["text_len"])
    jax.block_until_ready(variables)
    tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
    state = init_train_state(variables, tx)
    jstep = train_step_under_mesh(
        make_arasr_step(net, cfg, tx, axis_name="data"), mesh)
    log(f"{name}: compiling")
    state, m = jstep(state, batch, rng)
    np.asarray(m["loss"])
    best = None
    for trial in range(2):
        t0 = time.perf_counter()
        for i in range(N):
            state, m = jstep(state, batch,
                             jax.random.fold_in(rng, 1000 * trial + i))
        fl = float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
        log(f"{name} trial {trial}: {dt * 1e3:.1f} ms loss={fl:.1f}")
    results[name] = best * 1e3
    log(f"{name}: {best * 1e3:.2f} ms/step")


run("full", base_cfg())
run("no_ctc", base_cfg(ctc_weight=0.0))
run("no_specaug", base_cfg(specaug=None))
run("dec1", base_cfg(decoder=dict(d_model=D, num_heads=4, num_layers=1,
                                  fdfwd_dim=4 * D, fdfwd_activation="GELU")))
run("enc6", base_cfg(encoder=dict(d_model=D, num_heads=4, num_layers=6,
                                  fdfwd_dim=4 * D,
                                  fdfwd_activation="GELU")))
run("transformer_enc", base_cfg(
    encoder_type="transformer",
    encoder=dict(d_model=D, num_heads=4, num_layers=12, fdfwd_dim=4 * D,
                 fdfwd_activation="GELU")))

full = results["full"]
log("==== attribution ====")
for k, v in results.items():
    log(f"{k}: {v:.2f} ms (delta vs full {full - v:+.2f} ms)")
enc_half = full - results["enc6"]
log(f"encoder 12-layer est: {2 * enc_half:.1f} ms "
    f"({2 * enc_half / full * 100:.0f}% of step)")
log(f"conv-module est (conformer - transformer): "
    f"{full - results['transformer_enc']:.2f} ms")
