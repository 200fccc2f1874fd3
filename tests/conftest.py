"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding is validated on a virtual CPU mesh exactly as the
environment prescribes; real-TPU runs happen via bench.py / the driver.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
