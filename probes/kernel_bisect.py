"""Which part of the fused rel-pos fwd kernel costs 43us per (T,T)
problem? Time variants with pieces knocked out (wrong math, right cost)."""
import time, sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechain_tpu.ops.pallas_attention import (_row_roll, _softmax_fp32,
                                                _dropout_mask, _mask_scores,
                                                _btd_spec, _gmask_spec)

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
km = jnp.ones((B, 1, T), jnp.int32)
seed = jnp.zeros((1,), jnp.int32)

def make(variant):
    def kern(seed_ref, q_ref, k_ref, v_ref, ph_ref, bu_ref, m_ref, o_ref):
        i = pl.program_id(0)
        Dh = D // H
        for g in range(G):
            kmask = m_ref[g]
            qg, kg, vg = q_ref[g], k_ref[g], v_ref[g]
            for h in range(H):
                sl = slice(h * Dh, (h + 1) * Dh)
                qq, kk, vv = qg[:, sl], kg[:, sl], vg[:, sl]
                pp, bb = ph_ref[:, sl], bu_ref[:, sl]
                ac = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                if variant in ("dynroll", "dynroll_nodrop"):
                    # single variable-shift roll on an ALIGNED (8k, 128k)
                    # padded band: row i left-rolled by T-1-i ==
                    # right-roll by (P-T+1)+i (stride=1, modulo P). The
                    # pad region is never read: j + T-1-i <= 2T-2 < P.
                    W = jax.lax.dot_general(qq, pp, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    P = -(-(2 * T) // 128) * 128
                    Rp = -(-T // 8) * 8
                    Wp = jnp.pad(W, ((0, Rp - T), (0, P - (2 * T - 1))))
                    bd = pltpu.roll(Wp, P - T + 1, 1, stride=1,
                                    stride_axis=0)[:T, :T]
                    s = (ac + bd) * 0.0625
                elif variant == "ptroll":
                    W = jax.lax.dot_general(qq, pp, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    Wp = jnp.pad(W, ((0, 0), (0, 1)))
                    R, LL = Wp.shape
                    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                    amt = T - 1 - rows
                    n_bits = max(1, (R - 1).bit_length())
                    for kbit in range(n_bits):
                        step = 1 << kbit
                        rolled = pltpu.roll(Wp, LL - step, 1)
                        take = ((amt >> kbit) & 1) == 1
                        Wp = jnp.where(take, rolled, Wp)
                    bd = Wp[:, :T]
                    s = (ac + bd) * 0.0625
                elif variant in ("full", "noroll", "nosm", "nodrop"):
                    W = jax.lax.dot_general(qq, pp, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    if variant != "noroll":
                        Wp = jnp.pad(W, ((0, 0), (0, 1)))
                        bd = _row_roll(Wp, lambda i2: T - 1 - i2,
                                       left=True)[:, :T]
                    else:
                        bd = W[:, :T]
                    s = (ac + bd) * 0.0625
                else:  # "aconly"
                    s = ac * 0.0625
                s = _mask_scores(s, kmask, False)
                if variant != "nosm":
                    p = _softmax_fp32(s)
                else:
                    p = s
                if variant not in ("nodrop", "nosm", "dynroll_nodrop"):
                    p = p * _dropout_mask(p.shape, 0.1,
                                          seed_ref[0] + ((i*G+g)*H + h))
                o_ref[g, :, sl] = jax.lax.dot_general(
                    p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
    return kern

N_CHAIN = 10

def run(variant):
    kern = make(variant)
    def one(qq):
        return pl.pallas_call(
            kern, grid=(B // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      _btd_spec(G, T, D), _btd_spec(G, T, D),
                      _btd_spec(G, T, D),
                      pl.BlockSpec((L, D), lambda i: (0, 0)),
                      pl.BlockSpec((1, D), lambda i: (0, 0)),
                      _gmask_spec(G, T)],
            out_specs=_btd_spec(G, T, D),
            out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
        )(seed, qq, k, v, ph, bu, km)
    @jax.jit
    def chain(qq):
        for _ in range(N_CHAIN):
            qq = one(qq)
        return qq[0, 0, 0]
    out = chain(q); float(out)
    best = None
    for trial in range(2):
        t1 = time.perf_counter()
        for i in range(4):
            out = chain(q + jnp.bfloat16(1e-6 * i))
        float(out)
        d = (time.perf_counter() - t1) / (4 * N_CHAIN)
        best = d if best is None else min(best, d)
    log(f"{variant:8s}: {best*1e3:7.3f} ms/kernel-call")

# numeric check dynroll vs full first
import numpy as _np
def outs(variant):
    kern = make(variant)
    f = jax.jit(lambda qq: pl.pallas_call(
        kern, grid=(B // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _btd_spec(G, T, D), _btd_spec(G, T, D), _btd_spec(G, T, D),
                  pl.BlockSpec((L, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, D), lambda i: (0, 0)),
                  _gmask_spec(G, T)],
        out_specs=_btd_spec(G, T, D),
        out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
    )(seed, qq, k, v, ph, bu, km))
    return _np.asarray(f(q), _np.float32)
a = outs("nodrop"); b = outs("dynroll_nodrop")
log(f"dynroll vs logroll max abs err: {abs(a-b).max():.3e}")
for variant in ("dynroll", "full"):
    run(variant)
