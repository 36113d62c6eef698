"""TPU-branch parity for the relpos attention kernel (ADVICE r4 #2).

The production TPU branches of the relpos kernel (`_rel_scores2`'s
pltpu.roll path, `_unshift_y` / `_rel_unshift_full`) are structurally
different code from the interpret-mode branches CI exercises on CPU, so
a CPU-only suite cannot catch regressions in the roll/band geometry.
This test runs ONLY when a TPU backend is present (it self-skips on
CPU): forward value + input gradient of `flash_relpos_attention` (which
takes the TPU branches) against the plain-XLA rel_shift reference, for
several T values spanning the band-geometry cases (T % 8, P padding,
column offset c). Promoted from probes/rel_tpu_check.py.

To run on the real chip through the test conftest (which pins tests to
the virtual CPU mesh by default):
``SPEECHAIN_TPU_TEST_PLATFORM=axon pytest tests/test_tpu_kernel_branches.py``
— last executed on hardware in round 5: 5/5 passed (v5e, ~18 min,
compile-dominated).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires a real TPU backend (the TPU kernel branches do not "
           "exist in interpret mode)")


@pytest.mark.parametrize("T", [64, 99, 137, 200, 201])
def test_relpos_tpu_branch_matches_xla_reference(T):
    from speechain_tpu.nn.attention import rel_shift
    from speechain_tpu.ops.pallas_attention import flash_relpos_attention

    B, H, Dh = 4, 4, 64
    D = H * Dh
    rng = jax.random.PRNGKey(T)
    ks = jax.random.split(rng, 6)
    q = jax.random.normal(ks[0], (B, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, D), jnp.float32)
    ph = jax.random.normal(ks[3], (2 * T - 1, D), jnp.float32)
    bu = jax.random.normal(ks[4], (1, D), jnp.float32) * 0.1
    bv = jax.random.normal(ks[5], (1, D), jnp.float32) * 0.1
    km = (jnp.arange(T)[None, :] < jnp.full((B, 1), T)).astype(jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)
    scale = 1.0 / np.sqrt(D)

    def g(qq):
        return jnp.sum(flash_relpos_attention(
            qq, k, v, ph, bu, bv, seed, scale, H, 0.0, km) ** 2)

    val, grad = jax.jit(jax.value_and_grad(g))(q)

    def split(x):
        return x.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)

    phh = ph.reshape(2 * T - 1, H, Dh).transpose(1, 0, 2)

    def ref(qq):
        qh, kh, vh = split(qq), split(k), split(v)
        qu = qh + bu.reshape(H, Dh)[None, :, None, :]
        qv = qh + bv.reshape(H, Dh)[None, :, None, :]
        ac = jnp.einsum("bhqd,bhkd->bhqk", qu, kh)
        bd = rel_shift(jnp.einsum("bhqd,hkd->bhqk", qv, phh))
        p = jax.nn.softmax((ac + bd) * scale, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, vh) ** 2)

    with jax.default_matmul_precision("highest"):
        hval, hgrad = jax.jit(jax.value_and_grad(ref))(q)
    rval, rgrad = jax.jit(jax.value_and_grad(ref))(q)

    verr = abs(float(val) - float(hval)) / abs(float(hval))
    gerr = float(jnp.max(jnp.abs(grad - hgrad)) / jnp.max(jnp.abs(hgrad)))
    # noise floor: the default-precision XLA reference vs itself at
    # highest precision — the kernel is held to 3x that
    nerr = float(jnp.max(jnp.abs(rgrad - hgrad)) / jnp.max(jnp.abs(hgrad)))
    assert verr < 1e-4, (T, verr)
    assert gerr < 3 * max(nerr, 1e-4), (T, gerr, nerr)
