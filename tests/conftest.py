"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding logic is validated on host CPU with
``--xla_force_host_platform_device_count=8`` (no multi-chip TPU hardware is
available in CI); the driver separately compile-checks the real TPU path.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
