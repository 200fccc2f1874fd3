"""Test configuration: force an 8-device virtual CPU mesh.

The environment's axon sitecustomize registers the remote-TPU backend in every
Python process and overrides jax_platforms via jax.config — so setting the env
var is not enough; we must update the config back to cpu here (before any
backend is used). Multi-chip sharding is validated on the virtual CPU mesh;
real-TPU runs happen via bench.py / the driver.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
