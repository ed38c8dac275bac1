"""minimap2's invertible 64-bit mix hash, as used by the reference for
canonical k-mers (src/minimizer/minimizer.go:33-42).

Provided in two forms producing identical bits: NumPy (host) and jax.numpy
(device; runs under jit on CPU/TPU — XLA emulates 64-bit integer ops on TPU).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import hulk_tpu._jax_config  # noqa: F401  (enables x64)


def hash64_np(key: np.ndarray, mask: int) -> np.ndarray:
    key = key.astype(np.uint64)
    m = np.uint64(mask)
    key = (~key + (key << np.uint64(21))) & m
    key = key ^ (key >> np.uint64(24))
    key = ((key + (key << np.uint64(3))) + (key << np.uint64(8))) & m  # * 265
    key = key ^ (key >> np.uint64(14))
    key = ((key + (key << np.uint64(2))) + (key << np.uint64(4))) & m  # * 21
    key = key ^ (key >> np.uint64(28))
    key = (key + (key << np.uint64(31))) & m
    return key


def hash64_jnp(key, mask: int):
    key = key.astype(jnp.uint64)
    m = np.uint64(mask)
    key = (~key + (key << 21)) & m
    key = key ^ (key >> 24)
    key = ((key + (key << 3)) + (key << 8)) & m
    key = key ^ (key >> 14)
    key = ((key + (key << 2)) + (key << 4)) & m
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & m
    return key
