"""Test configuration.

Unit/sharding tests run on a virtual 8-device CPU mesh with 64-bit enabled so
they are hermetic and independent of TPU availability; the same code paths jit
onto TPU unchanged.

Note: this environment pre-imports jax at interpreter startup (axon platform
plugin), so env-var configuration is too late — jax.config.update is used
instead, before any backend is initialised.
"""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)
# The harness may export JAX_PLATFORMS=<tpu plugin>; cli._apply_platform_env
# honours that env var, which would silently route CLI-level tests through
# the real accelerator. Tests are hermetic CPU: override it.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("HULK_PLATFORM", None)

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

# Tests must NOT read the repo-shipped .jax_cache: it holds executables
# compiled on OTHER machines (prior driver/judge hosts) for the TPU bench's
# warm start, and XLA:CPU AOT results with mismatched host features load
# with a "could lead to execution errors" warning — a flake source. Tests
# compile into their own per-machine cache instead (hulk_tpu._jax_config
# may already have been imported transitively, so override its choice).
import tempfile  # noqa: E402

import hulk_tpu._jax_config  # noqa: E402, F401

_test_cache = os.path.join(tempfile.gettempdir(), "hulk_tpu_test_jax_cache")
os.makedirs(_test_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _test_cache)
