"""A/B optimization variants of the relpos fwd kernel body at bench dims.

Bisect (probes/relpos_fwd_bisect.py) showed softmax ~0.70 ms and the
strided roll ~0.66 ms of the 1.22 ms fwd call; matmuls are nearly free.
Variants (all keep exact math except where noted):
  full     — current production body (baseline)
  exp2     — softmax exp(x) as exp2(x * log2e) (same math, cheaper op)
  fold     — leave p unnormalized through dropout + ctx matmul, scale the
             (T, Dh) output rows by 1/sum instead of the (T, T) p matrix
  bf16roll — cast W band to bf16 for the strided rotate (halves vregs);
             bd re-joins the fp32 score path after
  combo    — exp2 + fold + bf16roll
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.ops.pallas_attention import (
    _btd_spec, _gmask_spec, _dropout_mask, _mask_scores, _softmax_fp32)

t0 = time.perf_counter()
def log(m): print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

B, T, D, H, G = 128, 201, 256, 4, 8
L = 2 * T - 1
dt = jnp.bfloat16
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (B, T, D), dt)
k = jax.random.normal(rng, (B, T, D), dt)
v = jax.random.normal(rng, (B, T, D), dt)
ph = jax.random.normal(rng, (L, D), dt)
bu = jax.random.normal(rng, (1, D), jnp.float32) * 0.1
bv = jax.random.normal(rng, (1, D), jnp.float32) * 0.1
km = jnp.ones((B, 1, T), jnp.int32)
seed = jnp.zeros((1,), jnp.int32)
scale = 0.0625
RATE = 0.1
LOG2E = 1.4426950408889634


def _shift(W, bf16_roll):
    P = -(-(2 * T + 8) // 128) * 128
    Rp = -(-T // 8) * 8
    c = (P - T + 1) % 8
    Wp = jnp.pad(W, ((0, Rp - T), (c, P - (2 * T - 1) - c)))
    if bf16_roll:
        Wp = Wp.astype(jnp.bfloat16)
    out = pltpu.roll(Wp, P - T + 1 - c, 1, stride=1,
                     stride_axis=0)[:T, :T]
    return out.astype(jnp.float32)


def make_v2(padrows):
    """Production v2 body: qu/qv bias+scale folding, pre-padded ph band,
    softmax fold. padrows=True additionally pads the W band rows to Rp
    (fp32 jnp.pad) before the strided rotate — isolates whether the
    unpadded-row (201, 512) rotate is the regression."""
    P = -(-(2 * T + 8) // 128) * 128
    Rp = -(-T // 8) * 8
    c = (P - T + 1) % 8

    def kern(seed_ref, q_ref, k_ref, v_ref, php_ref, bu_ref, bv_ref,
             m_ref, o_ref):
        i = pl.program_id(0)
        Dh = D // H
        for g in range(G):
            kmask = m_ref[g]
            qg, kg, vg = q_ref[g], k_ref[g], v_ref[g]
            qf = qg.astype(jnp.float32)
            qu_g = ((qf + bu_ref[...]) * scale).astype(dt)
            qv_g = ((qf + bv_ref[...]) * scale).astype(dt)
            for h in range(H):
                sl = slice(h * Dh, (h + 1) * Dh)
                kh, vh = kg[:, sl], vg[:, sl]
                ac = lax.dot_general(
                    qu_g[:, sl], kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                W = lax.dot_general(
                    qv_g[:, sl], php_ref[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if padrows:
                    W = jnp.pad(W, ((0, Rp - T), (0, 0)))
                bd = pltpu.roll(W, P - T + 1 - c, 1, stride=1,
                                stride_axis=0)[:T, :T]
                s = _mask_scores(ac + bd, kmask, False)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                den = jnp.sum(p, axis=-1, keepdims=True)
                p = p * _dropout_mask(p.shape, RATE,
                                      seed_ref[0] + ((i * G + g) * H + h))
                o = lax.dot_general(
                    p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) / den
                o_ref[g, :, sl] = o.astype(o_ref.dtype)
    return kern


def make(variant):
    use_exp2 = variant in ("exp2", "combo")
    use_fold = variant in ("fold", "combo")
    use_bf16roll = variant in ("bf16roll", "combo")

    def kern(seed_ref, q_ref, k_ref, v_ref, ph_ref, bu_ref, bv_ref,
             m_ref, o_ref):
        i = pl.program_id(0)
        Dh = D // H
        for g in range(G):
            kmask = m_ref[g]
            qg, kg, vg = q_ref[g], k_ref[g], v_ref[g]
            for h in range(H):
                sl = slice(h * Dh, (h + 1) * Dh)
                qh, kh, vh = qg[:, sl], kg[:, sl], vg[:, sl]
                phh = ph_ref[:, sl]
                buk = lax.dot_general(
                    bu_ref[:, sl].astype(dt), kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bvp = lax.dot_general(
                    bv_ref[:, sl].astype(dt), phh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ac = lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) + buk
                W = lax.dot_general(
                    qh, phh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) + bvp
                bd = _shift(W, use_bf16roll)
                s = _mask_scores((ac + bd) * scale, kmask, False)
                m = jnp.max(s, axis=-1, keepdims=True)
                if use_exp2:
                    p = jnp.exp2((s - m) * LOG2E)
                else:
                    p = jnp.exp(s - m)
                den = jnp.sum(p, axis=-1, keepdims=True)
                if not use_fold:
                    p = p / den
                p = p * _dropout_mask(p.shape, RATE,
                                      seed_ref[0] + ((i * G + g) * H + h))
                o = lax.dot_general(
                    p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if use_fold:
                    o = o / den
                o_ref[g, :, sl] = o.astype(o_ref.dtype)
    return kern


def run(variant):
    if variant.startswith("v2"):
        from speechain_tpu.ops.pallas_attention import _pad_ph_band
        P = -(-(2 * T + 8) // 128) * 128
        php = _pad_ph_band(ph, T, dt)
        kern = make_v2(padrows=(variant == "v2pad"))

        def one(qq):
            return pl.pallas_call(
                kern, grid=(B // G,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          _btd_spec(G, T, D), _btd_spec(G, T, D),
                          _btd_spec(G, T, D),
                          pl.BlockSpec((P, D), lambda i: (0, 0)),
                          pl.BlockSpec((1, D), lambda i: (0, 0)),
                          pl.BlockSpec((1, D), lambda i: (0, 0)),
                          _gmask_spec(G, T)],
                out_specs=_btd_spec(G, T, D),
                out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
            )(seed, qq, k, v, php, bu, bv, km)
    else:
        def one(qq):
            return pl.pallas_call(
                make(variant), grid=(B // G,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          _btd_spec(G, T, D), _btd_spec(G, T, D),
                          _btd_spec(G, T, D),
                          pl.BlockSpec((L, D), lambda i: (0, 0)),
                          pl.BlockSpec((1, D), lambda i: (0, 0)),
                          pl.BlockSpec((1, D), lambda i: (0, 0)),
                          _gmask_spec(G, T)],
                out_specs=_btd_spec(G, T, D),
                out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
            )(seed, qq, k, v, ph, bu, bv, km)

    @jax.jit
    def chain(qq):
        for _ in range(10):
            qq = one(qq)
        return qq

    try:
        out = jax.block_until_ready(chain(q))
    except Exception as e:  # noqa: BLE001
        log(f"{variant:9s}: FAIL {type(e).__name__}: {str(e)[:150]}")
        return
    best = None
    for trial in range(3):
        t1 = time.perf_counter()
        o = q
        for i in range(4):
            o = chain(o + jnp.bfloat16(1e-6))
        float(jnp.sum(o[0, 0, :1].astype(jnp.float32)))
        d = (time.perf_counter() - t1) / 40
        best = d if best is None else min(best, d)
    log(f"{variant:9s}: {best*1e3:7.3f} ms/call"
        f"  sum={float(jnp.sum(out.astype(jnp.float32))):.1f}")


for variant in (sys.argv[1:] or ["full", "exp2", "fold", "bf16roll",
                                 "combo"]):
    run(variant)
