"""Minimal reproducers for the three documented performance anomalies
(docs/BENCHMARKS.md; round-2 VERDICT item 6).

Run on the real TPU: ``python tools/probe_anomalies.py [a|b|c|all]``.
Each probe prints one line per measurement; paste results into
docs/BENCHMARKS.md.

(a) scanned multi-step 24x slowdown: is it pallas-in-scan (Mosaic) or
    scan itself? Times the same compute as (1) one pallas call,
    (2) pallas inside lax.scan, (3) the XLA-equivalent inside lax.scan,
    (4) XLA unscanned. If (2) alone is slow, the root cause is the Mosaic
    kernel under scan on this link, not the scan or dispatch model.

(b) ~30-execution warm-up: per-call wall time of calls 1..60 of a fresh
    executable, for two different program sizes. If the knee is at a
    similar call COUNT regardless of program size/shape, it is a
    per-executable runtime promotion (tunnel/runtime-side), not data- or
    compile-dependent.

(c) B=256 throughput regression: compiled memory analysis (temp/argument
    bytes) of the train step at B in {64,128,256,384} next to measured
    step time — if temp bytes cross the HBM budget where the regression
    starts, it is spills; if not, look at the reported per-B step time
    curve for the knee.

Timing protocol per docs/BENCHMARKS.md: value-copy barriers (np.asarray
of a scalar that depends on all prior work); block_until_ready is NOT a
barrier through this link.
"""

import sys
import time

import numpy as np


def _t():
    return time.perf_counter()


def probe_a():
    import jax
    import jax.numpy as jnp
    from speechain_tpu.ops.pallas_ffn import fused_ffn, fused_ffn_enabled

    print(f"# (a) pallas-in-scan — fused_ffn_enabled={fused_ffn_enabled()}")
    B, T, D, F = 16, 512, 256, 1024
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B * T, D), jnp.bfloat16)
    k1 = jax.random.normal(rng, (D, F), jnp.bfloat16) * 0.05
    b1 = jnp.zeros((F,), jnp.bfloat16)
    k2 = jax.random.normal(rng, (F, D), jnp.bfloat16) * 0.05
    b2 = jnp.zeros((D,), jnp.bfloat16)
    N = 20

    def xla_ffn(x):
        h = jnp.maximum(x @ k1 + b1, 0.0)
        return h @ k2 + b2

    seed = jnp.zeros((), jnp.int32)

    def pffn(c):
        return fused_ffn(c, k1, b1, k2, b2, seed, "ReLU", 0.0)

    import functools as ft
    cases = {
        "pallas x1 (jit)": jax.jit(lambda x: pffn(x).mean()),
        f"pallas in scan x{N}": jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (pffn(c), None), x, None, length=N)[0].mean()),
        f"XLA in scan x{N}": jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (xla_ffn(c), None), x, None, length=N)[0].mean()),
        f"XLA unrolled x{N}": jax.jit(lambda x: ft.reduce(
            lambda c, _: xla_ffn(c), range(N), x).mean()),
        f"pallas unrolled x{N}": jax.jit(lambda x: ft.reduce(
            lambda c, _: pffn(c), range(N), x).mean()),
    }
    for name, fn in cases.items():
        np.asarray(fn(x))                       # compile + warm
        for _ in range(40):                     # past the warm-up knee
            np.asarray(fn(x))
        t0 = _t()
        reps = 5
        for _ in range(reps):
            v = np.asarray(fn(x))
        dt = (_t() - t0) / reps
        per_call = dt / (N if "x%d" % N in name else 1)
        print(f"{name:24s}: {dt * 1e3:8.2f} ms/exec "
              f"({per_call * 1e3:7.3f} ms per ffn) value={float(v):.4f}")


def probe_b():
    import jax
    import jax.numpy as jnp

    print("# (b) per-executable warm-up knee")
    rng = jax.random.PRNGKey(0)
    for size, reps in ((512, 1), (2048, 4)):
        a = jax.random.normal(rng, (size, size), jnp.bfloat16)

        @jax.jit
        def chain(a):
            x = a
            for _ in range(8):
                x = (x @ a) * (1.0 / size)
            return x.mean()

        np.asarray(chain(a))                    # compile
        times = []
        for i in range(60):
            t0 = _t()
            np.asarray(chain(a))
            times.append(_t() - t0)
        ms = np.asarray(times) * 1e3
        knee = int(np.argmax(ms < 2 * ms[-10:].mean())) if (
            ms[:5].mean() > 2 * ms[-10:].mean()) else 0
        print(f"size={size}: first5={ms[:5].mean():8.1f} ms  "
              f"last10={ms[-10:].mean():6.2f} ms  knee@call={knee}  "
              f"per-call: {np.array2string(ms[:40], precision=0)}")


def probe_c():
    import jax
    import jax.numpy as jnp
    from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
    from speechain_tpu.ops.feat_norm import FeatNormConfig
    from speechain_tpu.ops.frontend import FrontendConfig
    from speechain_tpu.ops.specaug import SpecAugmentConfig
    from speechain_tpu.parallel.mesh import make_mesh, train_step_under_mesh
    from speechain_tpu.train.optim import build_optimizer
    from speechain_tpu.train.state import init_train_state, make_arasr_step

    print("# (c) batch-scaling: compiled memory analysis vs step time")
    V, D = 1000, 256
    cfg = ARASRConfig(
        vocab_size=V, frontend=FrontendConfig(n_mels=80),
        feat_norm=FeatNormConfig(feat_dim=80),
        specaug=SpecAugmentConfig(freq_mask_width=27, time_mask_width=0.05),
        enc_prenet=dict(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                        conv_batchnorm=True, conv_activation="LeakyReLU",
                        lnr_dims=D),
        encoder_type="conformer",
        encoder=dict(d_model=D, num_heads=4, num_layers=12,
                     fdfwd_dim=4 * D, fdfwd_activation="GELU"),
        dec_emb=dict(embedding_dim=D),
        decoder=dict(d_model=D, num_heads=4, num_layers=6, fdfwd_dim=4 * D,
                     fdfwd_activation="GELU"),
        ctc_weight=0.3, label_smoothing=0.1, dtype=jnp.bfloat16)
    net = ARASRNet(cfg=cfg)
    T, L = 8 * 16000, 32
    rng = jax.random.PRNGKey(0)
    mesh = make_mesh(n_data=len(jax.devices()))
    tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)

    for B in (64, 128, 256, 384):
        batch = dict(
            feat=jax.random.normal(rng, (B, T, 1)) * 0.1,
            feat_len=jnp.full((B,), T, jnp.int32),
            text=jax.random.randint(rng, (B, L), 2, V).astype(jnp.int32),
            text_len=jnp.full((B,), L, jnp.int32),
            epoch=jnp.zeros((), jnp.int32))
        variables = jax.jit(
            lambda r, f, fl_, t_, tl: net.init(
                {"params": r, "dropout": r, "specaug": r}, f, fl_, t_, tl,
                train=False))(rng, batch["feat"], batch["feat_len"],
                              batch["text"], batch["text_len"])
        state = init_train_state(variables, tx)
        jstep = train_step_under_mesh(
            make_arasr_step(net, cfg, tx, axis_name="data"), mesh)
        mem = ""
        try:
            lowered = jstep.lower(state, batch, rng)
            ma = lowered.compile().memory_analysis()
            mem = (f"temp={ma.temp_size_in_bytes / 2**30:.2f}GiB "
                   f"args={ma.argument_size_in_bytes / 2**30:.2f}GiB "
                   f"out={ma.output_size_in_bytes / 2**30:.2f}GiB")
        except Exception as e:                  # tunnel may not expose it
            mem = f"memory_analysis unavailable: {e!r}"
        state, m = jstep(state, batch, rng)
        np.asarray(m["loss"])
        for _ in range(35):                     # warm past the knee
            state, m = jstep(state, batch, jax.random.fold_in(rng, 1))
        np.asarray(m["loss"])
        reps = 10
        t0 = _t()
        for i in range(reps):
            state, m = jstep(state, batch, jax.random.fold_in(rng, i))
        final = float(np.asarray(m["loss"]))
        dt = (_t() - t0) / reps
        frames = B * (T // 160 + 1)
        print(f"B={B:4d}: {dt * 1e3:7.1f} ms/step  "
              f"{frames / dt / 1e3:7.0f}k frames/s  {mem}  "
              f"loss={final:.2f}")
        del state, variables, batch


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    print(f"devices: {jax.devices()}")
    if which in ("a", "all"):
        probe_a()
    if which in ("b", "all"):
        probe_b()
    if which in ("c", "all"):
        probe_c()
