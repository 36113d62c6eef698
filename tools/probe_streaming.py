"""Streaming-serving measurement on the real chip.

``python tools/probe_streaming.py [small|prod]`` — measures, under the
value-copy barrier protocol (docs/BENCHMARKS.md):

1. lockstep StreamingASR per-chunk latency (the serving latency of one
   live stream): wall time of `step` calls chained through a scalar copy;
2. StreamPool tick latency at several slot counts, and the implied
   serving capacity: with chunk length C seconds, a pool of B slots is
   real-time-capable iff tick latency < C, serving B concurrent streams
   — report streams-per-chip = B * C / tick_latency (clamped at B when
   faster than real time);
3. the int8-weight variant of (2) for the weight_quant serving path.

'small' is a CPU-smokeable config; 'prod' is the streaming recipe's
geometry (d=512, 12-layer causal encoder, 80 mels, 400 ms chunks at
16 kHz).
"""

import sys
import time

import numpy as np


def main(which: str = "prod"):
    import jax
    import jax.numpy as jnp

    from speechain_tpu.infer.stream_pool import (MODE_START, MODE_STEP,
                                                 StreamPool)
    from speechain_tpu.infer.streaming import StreamingASR
    from speechain_tpu.models.ar_asr import ARASRConfig, ARASRNet
    from speechain_tpu.ops.feat_norm import FeatNormConfig
    from speechain_tpu.ops.frontend import FrontendConfig

    if which == "small":
        d, layers, mels, sr, chunk_ms, cap = 64, 2, 20, 8000, 300, 512
        slot_grid = (4, 8)
    else:
        d, layers, mels, sr, chunk_ms, cap = 512, 12, 80, 16000, 400, 4096
        slot_grid = (8, 16, 32, 64)

    cfg = ARASRConfig(
        vocab_size=5000,
        frontend=FrontendConfig(n_mels=mels, sr=sr, win_length=0.025,
                                hop_length=0.01, preemphasis=0.97),
        feat_norm=FeatNormConfig(feat_dim=mels),
        enc_prenet=dict(conv_dims=[d, d], conv_kernel=3, conv_stride=2,
                        lnr_dims=d),
        encoder_type="transformer",
        encoder=dict(d_model=d, num_heads=max(d // 64, 1), num_layers=layers,
                     fdfwd_dim=4 * d, uni_direction=True),
        dec_emb=dict(embedding_dim=d),
        decoder=dict(d_model=d, num_heads=max(d // 64, 1), num_layers=2,
                     fdfwd_dim=4 * d),
        ctc_weight=0.3,
        dtype=jnp.bfloat16)
    net = ARASRNet(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    hop = cfg.frontend.hop
    S = max(int(chunk_ms / 1000.0 * sr) // hop, 1) * hop
    S = max(S, cfg.frontend.fft)
    chunk_sec = S / sr

    wave = jax.random.normal(rng, (1, 4 * S)) * 0.1
    variables = net.init(
        {"params": rng, "dropout": rng, "specaug": rng},
        wave[..., None], jnp.full((1,), 4 * S, jnp.int32),
        jnp.array([[1, 3, 4, 2]], jnp.int32), jnp.full((1,), 4, jnp.int32),
        train=False)
    print(f"config={which} d={d} layers={layers} chunk={S} samples "
          f"({chunk_sec * 1000:.0f} ms) cap={cap}", flush=True)

    def timed_stream(tag, make):
        """Warm up past the per-executable knee, then time chained steps
        with a scalar value-copy barrier per call."""
        obj, state, call = make()
        # warm-up: the first ~30 executions of a fresh executable run slow
        for _ in range(34):
            state, ids, emit = call(state)
            _ = np.asarray(ids[..., 0].sum())   # scalar barrier
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            state, ids, emit = call(state)
            _ = np.asarray(ids[..., 0].sum())
            times.append(time.perf_counter() - t0)
        lat = float(np.median(times))
        print(f"{tag}: median tick {lat * 1e3:.2f} ms "
              f"(chunk {chunk_sec * 1e3:.0f} ms)", flush=True)
        return lat

    # --- 1. lockstep single stream latency
    def make_lockstep():
        st = StreamingASR(net, variables, chunk_samples=S, max_frames=cap)
        state = st.reset(1)
        state, *_ = st.start(state, wave[:, :S])
        piece = wave[:, S:2 * S]

        def call(s):
            return st.step(s, piece)
        return st, state, call

    lat1 = timed_stream("lockstep B=1", make_lockstep)
    print(f"  single-stream serving latency per {chunk_sec * 1e3:.0f} ms "
          f"chunk: {lat1 * 1e3:.2f} ms "
          f"({'real-time OK' if lat1 < chunk_sec else 'TOO SLOW'})",
          flush=True)

    # --- 2./3. pool capacity, float and int8
    for wq in (None, "int8"):
        for slots in slot_grid:
            def make_pool(slots=slots, wq=wq):
                pool = StreamPool(net, variables, slots=slots,
                                  chunk_samples=S, max_frames=cap,
                                  weight_quant=wq)
                state = pool.reset()
                chunks = jnp.tile(wave[:, :S], (slots, 1))
                state, *_ = pool.tick(
                    state, chunks, jnp.full((slots,), MODE_START, jnp.int32),
                    jnp.zeros((slots,), jnp.int32))
                modes = jnp.full((slots,), MODE_STEP, jnp.int32)
                tails = jnp.zeros((slots,), jnp.int32)
                piece = jnp.tile(wave[:, S:2 * S], (slots, 1))

                def call(s):
                    return pool.tick(s, piece, modes, tails)
                return pool, state, call

            lat = timed_stream(f"pool wq={wq or 'fp'} slots={slots}",
                               make_pool)
            capacity = slots * min(chunk_sec / lat, 1.0) \
                if lat > chunk_sec else slots
            rtf = lat / chunk_sec
            print(f"  -> {slots} slots at {rtf:.3f}x realtime; "
                  f"concurrent real-time streams/chip ~= {capacity:.1f}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "prod")
