"""Validate FrontendConfig.matmul_precision='high' on real TPU hardware.

The DFT/mel matmuls run on the MXU; ``high`` uses 3-pass bf16 accumulation
(~f32-effective, ~2x faster) instead of ``highest`` (6-pass, full f32).
The BASELINE contract is log-Mel max-abs error < 1e-4 vs a float64 golden
(tests/test_frontend.py:114-129). This probe measures both error and speed
of each precision on the device it runs on, so the bench config can adopt
``high`` only if it actually meets the contract on TPU.

Run: python tools/validate_frontend_precision.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, ".")
    from speechain_tpu.ops.frontend import FrontendConfig, LogMelFrontend
    from tests.test_frontend import numpy_f64_logmel

    rng = np.random.RandomState(0)
    B, T = 8, 4 * 16000
    wave = (rng.randn(B, T) * 0.1).astype(np.float32)
    wave_len = np.full((B,), T, np.int32)

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    results = {}
    for prec in ("highest", "high", "default"):
        cfg = FrontendConfig(n_mels=80, preemphasis=0.97,
                             matmul_precision=prec)
        fe = LogMelFrontend(cfg)
        golden = numpy_f64_logmel(wave, wave_len, cfg)
        feat, flen = fe(jnp.asarray(wave), jnp.asarray(wave_len))
        feat = np.asarray(feat)
        err = float(np.max(np.abs(feat - golden)))
        # timing: warm up past the executable knee, then best-of-3
        jw, jl = jnp.asarray(wave), jnp.asarray(wave_len)
        for _ in range(40):
            feat_j, _ = fe(jw, jl)
        float(np.asarray(feat_j[0, 0, 0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                feat_j, _ = fe(jw, jl)
            float(np.asarray(feat_j[0, 0, 0]))
            best = min(best, (time.perf_counter() - t0) / 20)
        results[prec] = (err, best)
        ok = "OK (<1e-4)" if err < 1e-4 else "FAIL (>=1e-4)"
        print(f"{prec:8s}: max|err| vs f64 = {err:.3e}  {ok}   "
              f"{best * 1e3:6.2f} ms/call", flush=True)

    e_high = results["high"][0]
    print("\nverdict: 'high' " +
          ("MEETS the 1e-4 golden contract on this device — safe to adopt"
           if e_high < 1e-4 else
           "violates the 1e-4 contract on this device — keep 'highest'"))


if __name__ == "__main__":
    main()
