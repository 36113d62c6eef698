"""The driver-visible surface: ``__graft_entry__.entry`` + ``dryrun_multichip``.

These are the ONLY functions the external driver calls, and it calls them
without any of our conftest/env preamble — so ``dryrun_multichip`` is tested
in a clean subprocess (fresh interpreter, no XLA_FLAGS, no JAX_PLATFORMS)
to prove the function is hermetic on images whose sitecustomize force-registers
a TPU platform (round-1 failure mode: MULTICHIP_r01 ok=false from eager ops
landing on the default backend before the cpu fallback ran).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_forward_jits_and_is_finite():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.remove(REPO)
    fn, args = ge.entry()
    loss, metrics = jax.jit(fn)(*args)
    assert jnp.isfinite(loss), f"entry() loss not finite: {loss}"
    assert all(jnp.all(jnp.isfinite(v)) for v in metrics.values())


def test_dryrun_multichip_hermetic_subprocess():
    # Mimic the driver: a fresh interpreter that imports the module and calls
    # dryrun_multichip(8) directly. Strip our own platform/env overrides so
    # the function must do its own hermetic setup.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "SPEECHAIN_TPU_TEST_PLATFORM")}
    code = ("import sys; sys.path.insert(0, %r); "
            "import __graft_entry__ as ge; ge.dryrun_multichip(8)" % REPO)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed in a clean subprocess\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}")
    assert "dryrun_multichip(8)" in proc.stdout
