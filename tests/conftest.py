"""Test configuration.

Unit/sharding tests run on a virtual 8-device CPU mesh with 64-bit enabled so
they are hermetic and independent of TPU availability; the same code paths jit
onto TPU unchanged. Must run before jax import.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")
