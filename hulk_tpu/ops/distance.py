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
    """[N, s] sketch mins -> [N, N] positional-match similarity (fraction)."""
    n, s = mins.shape
    mins_p, nblocks = _pad_rows(mins, block)

    rows = []
    for i in range(nblocks):
        a = jax.lax.dynamic_slice_in_dim(mins_p, i * block, block, 0)  # [B, s]
        eq = (a[:, None, :] == mins[None, :, :]).astype(jnp.float64)
        rows.append(eq.sum(-1) / s)  # [B, N]
    return jnp.concatenate(rows, axis=0)[:n, :]


@partial(jax.jit, static_argnames=("block",))
def pairwise_weighted_jaccard_dist(mins, weights, *, block: int = 512):
    """[N, s] mins + weights -> [N, N] weighted Jaccard distance with the
    reference's subject-weights semantics (row = subject)."""
    n, s = mins.shape
    wabs = jnp.abs(weights)
    mins_p, nblocks = _pad_rows(mins, block)
    wabs_p, _ = _pad_rows(wabs, block)
    wsum_p = jnp.maximum(wabs_p.sum(-1), 1e-300)  # avoid 0/0 on pad rows

    rows = []
    for i in range(nblocks):
        a = jax.lax.dynamic_slice_in_dim(mins_p, i * block, block, 0)
        wa = jax.lax.dynamic_slice_in_dim(wabs_p, i * block, block, 0)
        ws = jax.lax.dynamic_slice_in_dim(wsum_p, i * block, block, 0)
        eq = (a[:, None, :] == mins[None, :, :]).astype(jnp.float64)
        inter = jnp.einsum("bns,bs->bn", eq, wa)
        rows.append(1.0 - inter / ws[:, None])
    return jnp.concatenate(rows, axis=0)[:n, :]
