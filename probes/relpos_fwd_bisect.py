"""Bisect the relpos fwd kernel's 1.22 ms/call at bench dims: which piece
costs what. Variants knock out one piece (wrong math, same structure):
  full    — current production kernel body
  nosm    — skip softmax (raw scores into ctx matmul)
  noroll  — skip the strided roll (use unshifted W band)
  noW     — skip the W matmul + roll entirely (bd = 0)
  aconly  — only ac + softmax + ctx (no biases, no W)
  batchW  — W matmul batched over the G group rows (one (G*T, Dh)x(Dh, L)
            matmul per head instead of G), roll still per row-block
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.ops.pallas_attention import (
    _btd_spec, _gmask_spec, _dropout_mask, _mask_scores, _rel_shift_band,
    _softmax_fp32)

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


def make(variant):
    def kern(seed_ref, q_ref, k_ref, v_ref, ph_ref, bu_ref, bv_ref,
             m_ref, o_ref):
        i = pl.program_id(0)
        Dh = D // H

        if variant == "batchW":
            q3 = q_ref[...]                      # (G, T, D)
            for h in range(H):
                sl = slice(h * Dh, (h + 1) * Dh)
                phh = ph_ref[:, sl]
                bvp = jax.lax.dot_general(
                    bv_ref[:, sl].astype(dt), phh,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # one (G*T, Dh) x (Dh, L) matmul for the whole group
                qh_all = q3[:, :, sl].reshape(G * T, Dh)
                W_all = jax.lax.dot_general(
                    qh_all, phh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) + bvp
                W3 = W_all.reshape(G, T, L)
                for g in range(G):
                    kmask = m_ref[g]
                    qh = q3[g][:, sl]
                    kh, vh = k_ref[g][:, sl], v_ref[g][:, sl]
                    buk = jax.lax.dot_general(
                        bu_ref[:, sl].astype(dt), kh,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ac = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) + buk
                    bd = _rel_shift_band(W3[g], T)
                    s = _mask_scores((ac + bd) * scale, kmask, False)
                    p = _softmax_fp32(s)
                    p = p * _dropout_mask(p.shape, RATE,
                                          seed_ref[0] + ((i*G+g)*H + h))
                    o_ref[g, :, sl] = jax.lax.dot_general(
                        p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(o_ref.dtype)
            return

        for g in range(G):
            kmask = m_ref[g]
            qg, kg, vg = q_ref[g], k_ref[g], v_ref[g]
            for h in range(H):
                sl = slice(h * Dh, (h + 1) * Dh)
                qh, kh, vh = qg[:, sl], kg[:, sl], vg[:, sl]
                phh = ph_ref[:, sl]
                buk = jax.lax.dot_general(
                    bu_ref[:, sl].astype(dt), kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ac = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) + buk
                if variant in ("noW", "aconly"):
                    s = ac * scale
                else:
                    bvp = jax.lax.dot_general(
                        bv_ref[:, sl].astype(dt), phh,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    W = jax.lax.dot_general(
                        qh, phh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) + bvp
                    if variant == "noroll":
                        bd = W[:, :T]
                    else:
                        bd = _rel_shift_band(W, T)
                    s = (ac + bd) * scale
                s = _mask_scores(s, kmask, False)
                p = s if variant == "nosm" else _softmax_fp32(s)
                p = p * _dropout_mask(p.shape, RATE,
                                      seed_ref[0] + ((i*G+g)*H + h))
                o_ref[g, :, sl] = jax.lax.dot_general(
                    p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
    return kern


def run(variant):
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
        log(f"{variant:8s}: FAIL {type(e).__name__}: {str(e)[:150]}")
        return
    best = None
    for trial in range(2):
        t1 = time.perf_counter()
        o = q
        for i in range(4):
            o = chain(o + jnp.bfloat16(1e-6))
        float(jnp.sum(o[0, 0, :1].astype(jnp.float32)))
        d = (time.perf_counter() - t1) / 40
        best = d if best is None else min(best, d)
    log(f"{variant:8s}: {best*1e3:7.3f} ms/call")


for variant in (sys.argv[1:] or ["full", "nosm", "noroll", "noW",
                                 "aconly", "batchW"]):
    run(variant)
