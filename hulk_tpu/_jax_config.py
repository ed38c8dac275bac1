"""Central JAX configuration.

The framework's exactness contract (bit-equality with the Go reference) needs
64-bit integer and float semantics, so x64 is enabled process-wide on first
import of any hulk_tpu compute module. Note: in this environment jax may be
pre-imported at interpreter startup by the platform plugin, which is why this
uses jax.config.update rather than environment variables.
"""
import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: TPU compiles of the 64-bit integer kernels
# are expensive (minutes); cache them across processes/runs. A repo-local
# cache (checked into git, next to the package) takes priority over the
# home-dir one: benchmark environments are recreated from a fresh checkout
# with an empty $HOME cache, and shipping the warmed cache with the source
# is the only way a cold process in a cold environment starts warm.
_repo_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
_cache_dir = os.environ.get("HULK_TPU_JAX_CACHE") or (
    _repo_cache
    if os.path.isdir(_repo_cache)
    else os.path.join(os.path.expanduser("~"), ".cache", "hulk_tpu", "jax_cache")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Keep call-site tracebacks out of MLIR locations: Pallas kernel payloads
# otherwise embed the entry script's path, which changes the serialized
# module byte-for-byte and defeats the persistent cache across entry points.
jax.config.update("jax_include_full_tracebacks_in_locations", False)
jax.config.update("jax_traceback_in_locations_limit", 0)
