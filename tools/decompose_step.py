"""Measured decomposition of the bench.py train step (round-3 refresh).

Times each stage of the B=128 conformer-small ASR step as its own jitted
executable under the honest protocol (docs/BENCHMARKS.md): chained calls
(each consumes the previous output) with a host VALUE copy as the only
barrier, warmed past the ~30-execution knee. Sublayer stacks are unrolled
N_LAYERS deep *inside* one executable — matching how the real step's
encoder loop compiles — so the ~5 ms/call link overhead is paid once per
executable, not once per sublayer.

Run on the real TPU: ``python tools/decompose_step.py [fwd|bwd|all]``.
Paste the table into docs/BENCHMARKS.md.
"""

import os
import sys
import time

import numpy as np


def _t():
    return time.perf_counter()


WARM = int(os.environ.get("DECOMP_WARM", "35"))
REPS = int(os.environ.get("DECOMP_REPS", "15"))


def timed(name, fn, x0, per=1):
    """Chained-call timing: x = fn(x) REPS times, value-copy at the end."""
    import jax
    x = fn(x0)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    for _ in range(WARM):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    t0 = _t()
    for _ in range(REPS):
        x = fn(x)
    v = np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    dt = (_t() - t0) / REPS
    print(f"{name:44s}: {dt * 1e3:8.2f} ms/exec "
          f"({dt / per * 1e3:7.3f} ms each of {per})  v={float(v[0]):.3g}",
          flush=True)
    return dt


def main(which="all"):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from speechain_tpu.utils.hardware import enable_hardware_rng
    enable_hardware_rng()

    from speechain_tpu.nn.conformer import (ConformerEncoder,
                                            ConvolutionModule,
                                            ConformerEncoderLayer)
    from speechain_tpu.nn.attention import RelPosMultiHeadedAttention
    from speechain_tpu.nn.feed_forward import PositionwiseFeedForward
    from speechain_tpu.nn.norms import LayerNorm
    from speechain_tpu.nn.posenc import RelPositionalEncoding

    B = int(os.environ.get("DECOMP_B", "128"))
    D, H = 256, 4
    NL = int(os.environ.get("DECOMP_LAYERS", "12"))
    T4 = int(os.environ.get("DECOMP_T", "200"))  # post-prenet, 8 s audio
    dt_ = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T4, D), dt_)
    mask = jnp.ones((B, 1, T4), bool)
    print(f"devices: {jax.devices()}  shapes: x={x.shape} {x.dtype}")

    # --- component modules, each stacked NL deep in one executable ----
    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=True):
            for i in range(NL):
                x = ConvolutionModule(channels=D, dtype=dt_,
                                      name=f"c{i}")(x, train=train) + x
            return x

    class MHAStack(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=True):
            xp, pe = RelPositionalEncoding(d_model=D, dropout=0.1,
                                           name="pe")(x, train=train)
            for i in range(NL):
                h, _ = RelPosMultiHeadedAttention(
                    d_model=D, num_heads=H, dropout=0.1, dtype=dt_,
                    name=f"a{i}")(xp, xp, xp, mask, pe, train=train,
                                  return_attmat=False)
                xp = h + xp
            return xp

    class FFNStack(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=True):
            for i in range(2 * NL):    # macaron: 2 halves per layer
                x = 0.5 * PositionwiseFeedForward(
                    d_model=D, fdfwd_dim=4 * D, fdfwd_activation="GELU",
                    dropout=0.1, dtype=dt_, name=f"f{i}")(x, train=train) + x
            return x

    class LNStack(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=True):
            for i in range(4 * NL):    # 4 LNs per conformer layer
                x = LayerNorm(epsilon=1e-6, name=f"l{i}")(x)
            return x

    enc = ConformerEncoder(d_model=D, num_heads=H, num_layers=NL,
                           fdfwd_dim=4 * D, fdfwd_activation="GELU",
                           dtype=dt_)

    def build(mod, call):
        vs = jax.jit(lambda r, x: mod.init(
            {"params": r, "dropout": r}, x, train=False))(rng, x)
        params = vs["params"]
        bs = vs.get("batch_stats", None)

        def fwd(xx):
            var = {"params": params} | ({"batch_stats": bs} if bs else {})
            out = mod.apply(var, xx, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"] if bs else False)
            return (out[0] if bs else out)

        def loss(p, xx):
            var = {"params": p} | ({"batch_stats": bs} if bs else {})
            out = mod.apply(var, xx, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"] if bs else False)
            o = out[0] if bs else out
            o = call(o)
            return (o.astype(jnp.float32) ** 2).mean()

        def fb(xx):
            gp, gx = jax.grad(loss, argnums=(0, 1))(params, xx)
            pen = sum((g.astype(jnp.float32) ** 2).sum()
                      for g in jax.tree_util.tree_leaves(gp))
            return xx - 1e-3 * gx + (1e-30 * pen).astype(xx.dtype)

        return jax.jit(fwd), jax.jit(fb)

    ident = lambda o: o
    enc_call = lambda o: o    # enc returns tuple; handled below

    specs = [
        ("conv module x12", ConvStack(), ident, NL),
        ("relpos MHA x12", MHAStack(), ident, NL),
        ("fused FFN x24 (macaron halves)", FFNStack(), ident, 2 * NL),
        ("LayerNorm x48", LNStack(), ident, 4 * NL),
    ]
    for name, mod, call, per in specs:
        fwd, fb = build(mod, call)
        if which in ("fwd", "all"):
            timed(f"{name} fwd", fwd, x, per)
        if which in ("bwd", "all"):
            timed(f"{name} fwd+bwd", fb, x, per)

    # full encoder (returns (out, mask, attmats, hiddens))
    vs = jax.jit(lambda r, x: enc.init(
        {"params": r, "dropout": r}, x, mask, train=False))(rng, x)
    params, bs = vs["params"], vs.get("batch_stats")

    def enc_fwd(xx):
        out = enc.apply({"params": params, "batch_stats": bs}, xx, mask,
                        train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])
        return out[0][0]

    def enc_loss(p, xx):
        out = enc.apply({"params": p, "batch_stats": bs}, xx, mask,
                        train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])
        return (out[0][0].astype(jnp.float32) ** 2).mean()

    def enc_fb(xx):
        gp, gx = jax.grad(enc_loss, argnums=(0, 1))(params, xx)
        pen = sum((g.astype(jnp.float32) ** 2).sum()
                  for g in jax.tree_util.tree_leaves(gp))
        return xx - 1e-3 * gx + (1e-30 * pen).astype(xx.dtype)

    if which in ("fwd", "all"):
        timed("conformer-12 encoder fwd", jax.jit(enc_fwd), x, NL)
    if which in ("bwd", "all"):
        timed("conformer-12 encoder fwd+bwd", jax.jit(enc_fb), x, NL)

    # ---- tail components: decoder, losses, prenet, frontend ----------
    if which in ("tail", "all"):
        from speechain_tpu.nn.transformer import TransformerDecoder
        from speechain_tpu.nn.prenets import Conv2dPrenet, EmbedPrenet
        from speechain_tpu.train import criteria
        from speechain_tpu.ops.frontend import FrontendConfig, LogMelFrontend
        import optax

        V, L = 1000, 32
        text = jax.random.randint(rng, (B, L), 2, V)
        tmask = jnp.ones((B, 1, L), bool)

        class DecStack(nn.Module):
            @nn.compact
            def __call__(self, tgt, mem, *, train=True):
                emb = EmbedPrenet(vocab_size=V, embedding_dim=D,
                                  name="emb")(text)
                out, *_ = TransformerDecoder(
                    d_model=D, num_heads=H, num_layers=6, fdfwd_dim=4 * D,
                    fdfwd_activation="GELU", dtype=dt_, name="dec")(
                        emb + tgt, mem, tmask, mask, train=train,
                        return_attmat=False)
                return nn.Dense(V, dtype=dt_, name="proj")(out)

        dec = DecStack()
        tgt0 = jax.random.normal(rng, (B, L, D), dt_)
        dvs = jax.jit(lambda r, t, m: dec.init(
            {"params": r, "dropout": r}, t, m, train=False))(rng, tgt0, x)

        def dec_loss(p, t, m):
            lg = dec.apply({"params": p}, t, m, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
            return (lg.astype(jnp.float32) ** 2).mean() * 1e-4

        def dec_fb(m):
            gp, gt, gm = jax.grad(dec_loss, argnums=(0, 1, 2))(
                dvs["params"], tgt0, m)
            pen = sum((g.astype(jnp.float32) ** 2).sum()
                      for g in jax.tree_util.tree_leaves((gp, gt)))
            return m - 1e-3 * gm + (1e-30 * pen).astype(m.dtype)

        timed("decoder-6 (emb+dec+proj) fwd+bwd", jax.jit(dec_fb), x, 1)

        # CTC + CE losses on encoder-output-shaped logits
        wctc = jax.random.normal(rng, (D, V), dt_) * 0.05

        def loss_fb(m):
            def f(mm, w):
                lg = (mm @ w.astype(mm.dtype)).astype(jnp.float32)
                lens = jnp.full((B,), T4, jnp.int32)
                tl = jnp.full((B,), L, jnp.int32)
                ctc = criteria.ctc_loss(lg, lens, text, tl)
                ce = criteria.cross_entropy(
                    lg[:, :L, :], text, tl, label_smoothing=0.1)
                return ctc * 0.3 + ce * 0.7
            gm, gw = jax.grad(f, argnums=(0, 1))(m, wctc)
            pen = (gw.astype(jnp.float32) ** 2).sum()
            return m - 1e-3 * gm + (1e-30 * pen).astype(m.dtype)

        timed("proj+CTC+CE losses fwd+bwd", jax.jit(loss_fb), x, 1)

        # Conv2d prenet on mel-shaped input
        Tm = 4 * T4
        mel = jax.random.normal(rng, (B, Tm, 80), dt_)
        mlen = jnp.full((B,), Tm, jnp.int32)
        pre = Conv2dPrenet(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                           conv_batchnorm=True, conv_activation="LeakyReLU",
                           lnr_dims=D, dtype=dt_)
        pvs = jax.jit(lambda r, f, fl: pre.init(
            {"params": r, "dropout": r}, f, fl, train=False))(rng, mel, mlen)

        def pre_loss(p, f):
            out = pre.apply(
                {"params": p, "batch_stats": pvs["batch_stats"]}, f, mlen,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (out[0][0].astype(jnp.float32) ** 2).mean()

        def pre_fb(f):
            gp, gf = jax.grad(pre_loss, argnums=(0, 1))(pvs["params"], f)
            pen = sum((g.astype(jnp.float32) ** 2).sum()
                      for g in jax.tree_util.tree_leaves(gp))
            return f - 1e-3 * gf + (1e-30 * pen).astype(f.dtype)

        timed("conv2d prenet fwd+bwd", jax.jit(pre_fb), mel, 1)

        # frontend fwd (fp32, no bwd — raw audio path; plain callable)
        fe = LogMelFrontend(cfg=FrontendConfig(n_mels=80, preemphasis=0.97))
        wav = jax.random.normal(rng, (B, 8 * 16000), jnp.float32) * 0.1
        wlen = jnp.full((B,), 8 * 16000, jnp.int32)

        def fe_fwd(w):
            out = fe(w, wlen)
            out = out[0] if isinstance(out, tuple) else out
            return w * (1.0 + 1e-30 * out.mean())

        timed("log-Mel frontend fwd", jax.jit(fe_fwd), wav, 1)

        # optimizer update on bench-sized params (flat adam + clip)
        from speechain_tpu.train.optim import build_optimizer
        tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
        fake = {f"p{i}": jax.random.normal(
            jax.random.fold_in(rng, i), (1024, 1024), jnp.float32) * 0.01
            for i in range(28)}          # ~29M params like the bench model
        ost = tx.init(fake)

        def opt_step(carry):
            p, st = carry
            g = jax.tree_util.tree_map(lambda a: a * 1e-3, p)
            up, st = tx.update(g, st, p)
            return (optax.apply_updates(p, up), st)

        timed("optimizer (clip+adam, 29M params)",
              jax.jit(opt_step), (fake, ost), 1)

    # ---- full-step kernel ablations (the bench step, one flag off at a
    # time; env flags are read at trace time so each combo retraces).
    # NOT in "all": 7 full-step compiles are ~25 min on the tunnel.
    if which == "ablate":
        import numpy as _np
        from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
        from speechain_tpu.ops.feat_norm import FeatNormConfig
        from speechain_tpu.ops.frontend import FrontendConfig
        from speechain_tpu.ops.specaug import SpecAugmentConfig
        from speechain_tpu.parallel.mesh import (make_mesh,
                                                 train_step_under_mesh)
        from speechain_tpu.train.optim import build_optimizer
        from speechain_tpu.train.state import (init_train_state,
                                               make_arasr_step)

        V = 1000
        cfg = ARASRConfig(
            vocab_size=V, frontend=FrontendConfig(n_mels=80,
                                                  preemphasis=0.97),
            feat_norm=FeatNormConfig(feat_dim=80),
            specaug=SpecAugmentConfig(freq_mask_width=27,
                                      time_mask_width=0.05),
            enc_prenet=dict(conv_dims=[D, D], conv_kernel=3, conv_stride=2,
                            conv_batchnorm=True,
                            conv_activation="LeakyReLU", lnr_dims=D),
            encoder_type="conformer",
            encoder=dict(d_model=D, num_heads=H, num_layers=12,
                         fdfwd_dim=4 * D, fdfwd_activation="GELU"),
            dec_emb=dict(embedding_dim=D),
            decoder=dict(d_model=D, num_heads=H, num_layers=6,
                         fdfwd_dim=4 * D, fdfwd_activation="GELU"),
            ctc_weight=0.3, label_smoothing=0.1, dtype=jnp.bfloat16)
        net = ARASRNet(cfg=cfg)
        Tw, L = 8 * 16000, 32
        batch = dict(
            feat=jax.random.normal(rng, (B, Tw, 1)) * 0.1,
            feat_len=jnp.full((B,), Tw, jnp.int32),
            text=jax.random.randint(rng, (B, L), 2, V).astype(jnp.int32),
            text_len=jnp.full((B,), L, jnp.int32),
            epoch=jnp.zeros((), jnp.int32))
        mesh = make_mesh(n_data=len(jax.devices()))
        tx = build_optimizer(optim_conf={"lr": 2e-3}, warmup_steps=4000)
        variables = jax.jit(
            lambda r, f, fl, tt, tl: net.init(
                {"params": r, "dropout": r, "specaug": r}, f, fl, tt, tl,
                train=False))(rng, batch["feat"], batch["feat_len"],
                              batch["text"], batch["text_len"])

        combos = [
            ("all kernels on", {}),
            ("convmod kernel OFF", {"SPEECHAIN_DISABLE_FUSED_CONVMOD": "1"}),
            ("ffn-residual epilogue OFF",
             {"SPEECHAIN_DISABLE_FUSED_FFN_RESIDUAL": "1"}),
            ("ffn kernel OFF", {"SPEECHAIN_DISABLE_FUSED_FFN": "1"}),
            ("flash attention OFF", {"SPEECHAIN_DISABLE_FLASH_ATT": "1"}),
            ("fused LN OFF", {"SPEECHAIN_DISABLE_FUSED_LN": "1"}),
            ("ALL pallas OFF", {"SPEECHAIN_DISABLE_PALLAS": "1"}),
        ]
        frames = B * (Tw // 160 + 1)
        for name, env in combos:
            for kk, vv in env.items():
                os.environ[kk] = vv
            try:
                state = init_train_state(variables, tx)
                jstep = train_step_under_mesh(
                    make_arasr_step(net, cfg, tx, axis_name="data"), mesh)
                state, m = jstep(state, batch, rng)
                _np.asarray(m["loss"])
                for w in range(WARM):
                    state, m = jstep(state, batch,
                                     jax.random.fold_in(rng, w))
                _np.asarray(m["loss"])
                t0 = _t()
                for r in range(REPS):
                    state, m = jstep(state, batch,
                                     jax.random.fold_in(rng, 100 + r))
                lv = float(_np.asarray(m["loss"]))
                dt = (_t() - t0) / REPS
                print(f"step[{name:28s}]: {dt * 1e3:7.1f} ms/step "
                      f"{frames / dt / 1e3:6.0f}k frames/s  loss={lv:.2f}",
                      flush=True)
                del state, jstep
            finally:
                for kk in env:
                    os.environ.pop(kk, None)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
