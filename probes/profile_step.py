"""Capture a profiler trace of the full train step and print the top ops
by self time (parsed from the xplane proto — no TensorBoard UI needed)."""
import time, sys, os, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

# persistent compile cache (same as bench.py): repeat probe runs skip the
# multi-minute remote compiles
try:
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/speechain_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from speechain_tpu.utils.hardware import enable_hardware_rng
enable_hardware_rng()
from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import FrontendConfig
from speechain_tpu.ops.specaug import SpecAugmentConfig
from speechain_tpu.train.optim import build_optimizer
from speechain_tpu.train.state import init_train_state, make_arasr_step

V, D, B, L = 1000, 256, 128, 32
T = 8 * 16000
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
tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
state = init_train_state(variables, tx)
step = jax.jit(make_arasr_step(net, cfg, tx, axis_name=None),
               donate_argnums=())
print("compiling...", flush=True)
state2, m = step(state, batch, rng)
print("loss", float(np.asarray(m["loss"])), flush=True)
# warm chain
st = state
for i in range(35):
    st, m = step(st, batch, jax.random.fold_in(rng, i))
float(np.asarray(m["loss"]))
outdir = "/tmp/profile_step"
with jax.profiler.trace(outdir):
    for i in range(5):
        st, m = step(st, batch, jax.random.fold_in(rng, 100 + i))
    float(np.asarray(m["loss"]))
print("trace written", flush=True)

# parse xplane
try:
    from tensorboard_plugin_profile.protobuf import xplane_pb2
except ImportError:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
paths = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
print(paths)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    print("PLANE:", plane.name)
    evs = {}
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            evs[name] = evs.get(name, 0) + ev.duration_ps / 1e9  # ms
    top = sorted(evs.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(evs.values())
    print(f"total event ms (5 steps, all lines): {tot:.1f}")
    for name, ms in top:
        print(f"  {ms/5:8.3f} ms/step  {name[:110]}")
