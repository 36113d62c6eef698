"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding logic is validated on host CPU with
``--xla_force_host_platform_device_count=8`` (no multi-chip TPU hardware is
available in CI); the driver separately compile-checks the real TPU path.

The session image registers an ``axon`` TPU platform via sitecustomize and
overrides ``JAX_PLATFORMS``, so the env var alone is not enough — we must set
``jax.config.jax_platforms`` after import, before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update(
    "jax_platforms", os.environ.get("SPEECHAIN_TPU_TEST_PLATFORM", "cpu")
)
