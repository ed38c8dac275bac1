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


def _pad_rows(x, block):
    n = x.shape[0]
    nblocks = -(-n // block)
    pad = nblocks * block - n
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)), nblocks


@partial(jax.jit, static_argnames=("block",))
def pairwise_jaccard_sim(mins, *, block: int = 512):
    """[N, s] sketch mins -> [N, N] positional-match similarity (fraction).
    Match counts are small integers, so i32 accumulation + one f64 divide is
    exact."""
    n, s = mins.shape
    mins_p, nblocks = _pad_rows(mins, block)

    rows = []
    for i in range(nblocks):
        a = jax.lax.dynamic_slice_in_dim(mins_p, i * block, block, 0)  # [B, s]
        eq = (a[:, None, :] == mins[None, :, :]).astype(jnp.int32)
        rows.append(eq.sum(-1).astype(jnp.float64) / s)  # [B, N]
    return jnp.concatenate(rows, axis=0)[:n, :]


@partial(jax.jit, static_argnames=("block",))
def pairwise_weighted_jaccard_dist(mins, weights, *, block: int = 512):
    """[N, s] mins + weights -> [N, N] weighted Jaccard distance with the
    reference's subject-weights semantics (row = subject).

    The intersection sum accumulates in f64 via a lax.scan over slots —
    elementwise masked adds, NOT an einsum: XLA's f64 dot lowering on TPU
    (no f64 MXU) was measured ~100x slower than this form. The result
    reassociates the reference's left-to-right sum but is f64 throughout
    (error ~1e-15 relative); callers that print %.2f CSV cells re-check
    cells within 1e-5 of a rounding boundary against the exact host path
    (cli._smash_matrix_device), making the printed matrix provably
    reference-CSV-exact.
    """
    n, s = mins.shape
    wabs = jnp.abs(weights)
    wsum = jnp.maximum(wabs.sum(-1), 1e-300)

    mins_p, nblocks = _pad_rows(mins, block)
    wabs_p, _ = _pad_rows(wabs, block)
    wsum_p, _ = _pad_rows(wsum[:, None], block)

    rows = []
    for i in range(nblocks):
        a = jax.lax.dynamic_slice_in_dim(mins_p, i * block, block, 0)
        wa = jax.lax.dynamic_slice_in_dim(wabs_p, i * block, block, 0)
        ws = jax.lax.dynamic_slice_in_dim(wsum_p, i * block, block, 0)[:, 0]
        eq = a[:, None, :] == mins[None, :, :]  # [B, N, s] bool

        def body(acc, xs):
            eq_j, w_j = xs  # [B, N], [B]
            return acc + jnp.where(eq_j, w_j[:, None], 0.0), None

        acc0 = jnp.zeros(eq.shape[:2], dtype=jnp.float64)
        inter, _ = jax.lax.scan(
            body, acc0, (jnp.moveaxis(eq, 2, 0), wa.T)
        )
        rows.append(1.0 - inter / jnp.maximum(ws[:, None], 1e-300))
    return jnp.concatenate(rows, axis=0)[:n, :]
