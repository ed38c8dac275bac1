"""Central JAX configuration.

The framework's exactness contract (bit-equality with the Go reference) needs
64-bit integer and float semantics, so x64 is enabled process-wide on first
import of any hulk_tpu compute module. Note: in this environment jax may be
pre-imported at interpreter startup by the platform plugin, which is why this
uses jax.config.update rather than environment variables.
"""
import jax

jax.config.update("jax_enable_x64", True)
