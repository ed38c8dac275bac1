"""Device-resident maintenance of the secondary sketches (KMV/KHF/HMH).

These are the streaming-sketch states the reference constructs but never
feeds (SURVEY.md §2.1 dead wiring); here they update on-device from the same
compacted minimizer stream as the spectrum, so the full `hulk sketch
--kmv --khf --hmh` pipeline can run without per-batch host pulls. All
updates are integer-exact on TPU and bit-match the host classes (tested).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import hulk_tpu._jax_config  # noqa: F401

_SENT = np.uint64(0xFFFFFFFFFFFFFFFF)


@jax.jit
def kmv_update(state, svals):
    """state: [s] current bottom-k (U64MAX padded). svals: sorted flat batch
    values (sentinel padded). The batch's k smallest are its first k entries,
    so one merge+sort of 2k elements suffices."""
    s = state.shape[0]
    merged = jnp.sort(jnp.concatenate([state, svals[:s]]))
    return merged[:s]


@jax.jit
def khf_update(state, svals):
    """state: [s] minima of (i+1)*hv (wrapping). Dead lanes excluded via
    post-multiply masking (no universally-max input exists under wrap)."""
    s = state.shape[0]
    live = svals != _SENT
    i = np.arange(s, dtype=np.uint64)[:, None]  # host constant
    vals = svals[None, :] + i * svals[None, :]
    vals = jnp.where(live[None, :], vals, _SENT)
    return jnp.minimum(state, vals.min(axis=1))


def _mix64_jnp(x):
    z = x.astype(jnp.uint64)
    z = (z ^ (z >> 30)) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> 27)) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> 31)


def _bitlen_jnp(x):
    n = jnp.zeros_like(x, dtype=jnp.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        big = x >= np.uint64(1 << sh)
        n = n + jnp.where(big, sh, 0)
        x = jnp.where(big, x >> sh, x)
    return n + jnp.where(x > 0, 1, 0).astype(jnp.int64)


@partial(jax.jit, static_argnames=("p", "q", "r"))
def hmh_update(registers, svals, *, p: int, q: int, r: int):
    """HyperMinHash register scatter-max (mirrors sketch/hyperminhash.py)."""
    live = svals != _SENT
    h = _mix64_jnp(svals)
    bucket = (h >> (64 - p)).astype(jnp.int32)
    rest = h << p
    lz = jnp.minimum(64 - _bitlen_jnp(rest) + 1, (1 << q) - 1)
    rbits = h & np.uint64((1 << r) - 1)
    enc = (lz.astype(jnp.uint64) << r) | (np.uint64((1 << r) - 1) - rbits)
    enc = jnp.where(live, enc, np.uint64(0))
    bucket = jnp.where(live, bucket, 0)
    return registers.at[bucket].max(enc)
