"""On-chip A/B: per-layer remat vs none at B in {128, 256} (VERDICT r3 #3).

Builds the exact bench train step (bench.py ARCH) with encoder/decoder
remat toggled, times N chained steps with the value-copy barrier protocol.
Paste results into docs/BENCHMARKS.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from speechain_tpu.utils.hardware import enable_hardware_rng
enable_hardware_rng()
from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig
from speechain_tpu.ops.specaug import SpecAugmentConfig
from speechain_tpu.parallel.mesh import make_mesh, train_step_under_mesh
from speechain_tpu.train.optim import build_optimizer
from speechain_tpu.train.state import init_train_state, make_arasr_step

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

V, D, L, T = 1000, 256, 32, 8 * 16000
N = 20


def run(B, remat):
    cfg = ARASRConfig(
        vocab_size=V, frontend=FrontendConfig(n_mels=80, preemphasis=0.97),
        feat_norm=FeatNormConfig(feat_dim=80),
        specaug=SpecAugmentConfig(freq_mask_width=27, time_mask_width=0.05),
        enc_prenet=dict(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                        conv_batchnorm=True, conv_activation="LeakyReLU",
                        lnr_dims=D),
        encoder_type="conformer",
        encoder=dict(d_model=D, num_heads=4, num_layers=12, fdfwd_dim=4 * D,
                     fdfwd_activation="GELU", remat=remat),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=6, fdfwd_dim=4 * D,
                     fdfwd_activation="GELU", remat=remat),
        ctc_weight=0.3, label_smoothing=0.1, dtype=jnp.bfloat16,
    )
    net = ARASRNet(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    batch = dict(
        feat=jax.random.normal(rng, (B, T, 1)) * 0.1,
        feat_len=jnp.full((B,), T, jnp.int32),
        text=jax.random.randint(rng, (B, L), 2, V).astype(jnp.int32),
        text_len=jnp.full((B,), L, jnp.int32),
        epoch=jnp.zeros((), jnp.int32))
    tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
    mesh = make_mesh(n_data=len(jax.devices()))
    variables = jax.jit(
        lambda r, f, fl, tt, tl: net.init(
            {"params": r, "dropout": r, "specaug": r}, f, fl, tt, tl,
            train=False)
    )(rng, batch["feat"], batch["feat_len"], batch["text"],
      batch["text_len"])
    jax.block_until_ready(variables)
    st = init_train_state(variables, tx)
    jstep = train_step_under_mesh(
        make_arasr_step(net, cfg, tx, axis_name="data"), mesh)
    st, m = jstep(st, batch, rng)
    np.asarray(m["loss"])
    best = None
    for trial in range(2):
        t1 = time.perf_counter()
        for i in range(N):
            st, m = jstep(st, batch, jax.random.fold_in(rng, i))
        float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t1) / N
        best = dt if best is None else min(best, dt)
    frames = B * (T // 160 + 1)
    log(f"B={B:4d} remat={int(remat)}: {best*1e3:7.1f} ms/step  "
        f"{frames/best:,.0f} frames/s")
    del st, jstep
    return best


for B in (128, 256):
    for remat in (False, True):
        try:
            run(B, remat)
        except Exception as e:  # noqa: BLE001
            log(f"B={B} remat={int(remat)}: FAIL {type(e).__name__}: "
                f"{str(e)[:200]}")
