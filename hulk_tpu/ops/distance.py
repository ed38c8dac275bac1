"""Batched all-pairs distance kernels (smash on device).

The reference computes the N x N matrix with a nested scalar loop including
both triangles and the diagonal (cmd/smash.go:209-224); here the whole matrix
is a blocked device computation.

With the reference's subject-weights bug (sketchio.go:293-298 — both weight
vectors come from the row/subject sketch), the weighted Jaccard distance
simplifies to

    d(i -> j) = 1 - sum_k{ |w_i[k]| * [mins_i[k] == mins_j[k]] } / sum_k |w_i[k]|

which makes the matrix a masked matmul — ideal for the MXU. The host scalar
path (sketch/distances.py) preserves the reference's exact left-to-right
summation; this batched path reassociates sums (bit-differences land below
the 2-decimal CSV rounding).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import hulk_tpu._jax_config  # noqa: F401


import numpy as np


def _pad_rows(x, block):
    n = x.shape[0]
    nblocks = -(-n // block)
    pad = nblocks * block - n
    return np.pad(np.asarray(x), ((0, pad),) + ((0, 0),) * (x.ndim - 1)), nblocks


@partial(jax.jit, static_argnames=())
def _jaccard_block(a, b):
    """[B, s] x [C, s] -> [B, C] match counts (exact i32)."""
    return (a[:, None, :] == b[None, :, :]).astype(jnp.int32).sum(-1)


def wjd_block_body(a, wa, ws, b):
    """[B, s] mins + |weights| + row sums x [C, s] mins -> [B, C] distances.

    The intersection sum accumulates in f64 via a lax.scan over slots —
    elementwise masked adds, NOT an einsum: XLA's f64 dot lowering on TPU
    (no f64 MXU) was measured ~100x slower than this form. The result
    reassociates the reference's left-to-right sum but is f64 throughout
    (error ~1e-15 relative); callers that print %.2f CSV cells re-check
    cells within 1e-5 of a rounding boundary against the exact host path
    (cli._smash_matrix_device), making the printed matrix provably
    reference-CSV-exact. Unjitted body — reused under shard_map by the
    mesh-sharded smash (parallel/smash.py).
    """
    eq = a[:, None, :] == b[None, :, :]  # [B, C, s] bool

    def body(acc, xs):
        eq_j, w_j = xs  # [B, C], [B]
        return acc + jnp.where(eq_j, w_j[:, None], 0.0), None

    acc0 = jnp.zeros_like(eq[:, :, 0], dtype=jnp.float64)
    inter, _ = jax.lax.scan(body, acc0, (jnp.moveaxis(eq, 2, 0), wa.T))
    return 1.0 - inter / jnp.maximum(ws[:, None], 1e-300)


_wjd_block = jax.jit(wjd_block_body)


def pairwise_jaccard_sim(mins, *, block: int = 512, col_block: int = 4096):
    """[N, s] sketch mins -> [N, N] positional-match similarity (fraction).
    Match counts are small integers, so i32 accumulation + one f64 divide is
    exact. Blocked in both dimensions: device memory stays at
    block*col_block*s regardless of N."""
    mins = np.asarray(mins)
    n, s = mins.shape
    mp, nb = _pad_rows(mins, block)
    mc, nc = _pad_rows(mins, col_block)
    out = np.empty((nb * block, n), dtype=np.float64)
    for i in range(nb):
        a = mp[i * block : (i + 1) * block]
        for j in range(nc):
            b = mc[j * col_block : (j + 1) * col_block]
            cnt = np.asarray(_jaccard_block(a, b))
            lo, hi = j * col_block, min((j + 1) * col_block, n)
            out[i * block : (i + 1) * block, lo:hi] = cnt[:, : hi - lo] / s
    return out[:n]


def pairwise_weighted_jaccard_dist(mins, weights, *, block: int = 512,
                                   col_block: int = 4096):
    """[N, s] mins + weights -> [N, N] weighted Jaccard distance with the
    reference's subject-weights semantics (row = subject). See _wjd_block
    for numerics; blocked in both dimensions for unbounded N."""
    mins = np.asarray(mins)
    weights = np.asarray(weights)
    n, s = mins.shape
    wabs = np.abs(weights)
    wsum = np.maximum(wabs.sum(-1), 1e-300)
    mp, nb = _pad_rows(mins, block)
    wp, _ = _pad_rows(wabs, block)
    sp, _ = _pad_rows(wsum[:, None], block)
    mc, nc = _pad_rows(mins, col_block)
    out = np.empty((nb * block, n), dtype=np.float64)
    for i in range(nb):
        a = mp[i * block : (i + 1) * block]
        wa = wp[i * block : (i + 1) * block]
        ws = sp[i * block : (i + 1) * block, 0]
        for j in range(nc):
            b = mc[j * col_block : (j + 1) * col_block]
            d = np.asarray(_wjd_block(a, wa, ws, b))
            lo, hi = j * col_block, min((j + 1) * col_block, n)
            out[i * block : (i + 1) * block, lo:hi] = d[:, : hi - lo]
    return out[:n]
