"""Lamping-Veach consistent jump hash (arXiv:1406.2294), bit-exact with the
dgryski/go-jump dependency used by the reference for spectrum binning
(src/kmerspectrum/kmerspectrum.go:70) and CMS rows (src/countmin/countmin.go:125).

The loop is data-dependent (expected ~ln(n) iterations); both forms run it as
a masked vectorised loop until all lanes converge. Float64 division and
multiplication are IEEE-exact, so results match Go on any IEEE platform.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import hulk_tpu._jax_config  # noqa: F401  (enables x64)

_LCG = 2862933555777941757
_TWO31 = 2147483648.0


def jump_hash_np(key: np.ndarray, num_buckets: int) -> np.ndarray:
    """Vectorised jump hash; key uint64 array -> int32 bucket in [0, n)."""
    key = key.astype(np.uint64).copy()
    n = np.int64(num_buckets)
    b = np.full(key.shape, -1, dtype=np.int64)
    j = np.zeros(key.shape, dtype=np.int64)
    active = j < n
    while np.any(active):
        b = np.where(active, j, b)
        key = np.where(active, key * np.uint64(_LCG) + np.uint64(1), key)
        d = ((key >> np.uint64(33)) + np.uint64(1)).astype(np.float64)
        jf = (b + 1).astype(np.float64) * (_TWO31 / d)
        j = np.where(active, jf.astype(np.int64), j)  # trunc toward zero
        active = active & (j < n)
    return b.astype(np.int32)


def jump_hash_jnp(key, num_buckets: int):
    """Same under jit. num_buckets is static."""
    n = jnp.int64(num_buckets)

    def cond(state):
        key, b, j, active = state
        return jnp.any(active)

    def body(state):
        key, b, j, active = state
        b = jnp.where(active, j, b)
        key = jnp.where(active, key * jnp.uint64(_LCG) + jnp.uint64(1), key)
        d = ((key >> 33) + jnp.uint64(1)).astype(jnp.float64)
        jf = (b + 1).astype(jnp.float64) * (_TWO31 / d)
        j = jnp.where(active, jf.astype(jnp.int64), j)
        active = active & (j < n)
        return key, b, j, active

    key = key.astype(jnp.uint64)
    # derive the carry from `key` so varying-axis types stay consistent when
    # this runs inside shard_map (a constant-derived carry would be
    # device-invariant while the loop outputs are varying)
    zeros = jnp.zeros_like(key, dtype=jnp.int64)
    b0 = zeros - 1
    j0 = zeros
    active0 = j0 < n
    _, b, _, _ = jax.lax.while_loop(cond, body, (key, b0, j0, active0))
    return b.astype(jnp.int32)
