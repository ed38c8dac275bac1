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


def wjd_recheck_margin(s: int) -> float:
    """Sound bound on |device d − exact f64 d| for the kernel below, with
    4x slack. Error sources, all absolute (the summed terms are positive,
    row-normalized in f64, total <= 1): the f64 normalize divide and scan
    reassociation contribute ~s·2^-53 (< 2^-38 to s=2^15); the single f32
    cast of each result cell (transport compression: the [B, C] matrix is
    the D2H payload, d in [0, 1]) contributes <= 2^-24. Total < 2·2^-24.
    Any cell farther than this margin from a %.2f rounding boundary
    provably prints the same CSV digits as the exact host path; cells
    inside it (~0.5% at uniform cell distribution) are recomputed on the
    host."""
    del s  # s-independent; kept for call-site clarity
    return 8.0 * 2.0 ** -24


def wjd_block_body(a, wn, b):
    """[B, s] mins + row-normalized f64 |weights| x [C, s] mins -> [B, C]
    distances as f32 (transport form; error budget in wjd_recheck_margin).

    The intersection sum accumulates in f64 via a lax.scan over slots —
    elementwise masked adds, NOT an einsum: XLA's f64 dot lowering on TPU
    (no f64 MXU) measures ~100x slower, while this form reaches ~1G
    cells/s/chip (the scan reassociates the reference's left-to-right sum;
    ~1e-15). Callers pre-normalize |w_i|/sum|w_i| in f64, so there is no
    per-cell divide and the result is directly 1 − matched fraction. The
    f32 cast halves the D2H payload; the CLI re-checks cells within
    wjd_recheck_margin of a %.2f boundary against the exact host path, so
    the printed matrix is provably reference-CSV-exact. Unjitted body —
    reused under shard_map by the mesh-sharded smash (parallel/smash.py).
    """
    eq = a[:, None, :] == b[None, :, :]  # [B, C, s] bool

    def body(acc, xs):
        eq_j, w_j = xs  # [B, C], [B]
        return acc + jnp.where(eq_j, w_j[:, None], 0.0), None

    # zeros_like keeps the carry varying over the shard_map mesh axes (a
    # fresh jnp.zeros would be unvarying and fail the scan carry typecheck)
    acc0 = jnp.zeros_like(eq[:, :, 0], dtype=jnp.float64)
    inter, _ = jax.lax.scan(body, acc0, (jnp.moveaxis(eq, 2, 0), wn.T))
    return (1.0 - inter).astype(jnp.float32)


_wjd_block = jax.jit(wjd_block_body)


# Max result blocks in flight per pairwise call: dispatch stays async (the
# fixed per-roundtrip tunnel cost is amortised across the window) but device
# memory for un-fetched results is bounded at MAX_PENDING_BLOCKS *
# block*col_block*4 B (~256 MB at the defaults) instead of the whole N^2
# matrix — at N=100k the full f32 matrix would be ~40 GB and OOM the HBM.
MAX_PENDING_BLOCKS = 32


def _drain_oldest(pend, out, col_block, n, postproc, keep: int) -> None:
    """Fetch (np.asarray) the oldest pending blocks until <= keep remain."""
    while len(pend) > keep:
        i, j, block_rows, d = pend.pop(0)
        lo, hi = j * col_block, min((j + 1) * col_block, n)
        out[i * block_rows : (i + 1) * block_rows, lo:hi] = postproc(
            np.asarray(d)[:, : hi - lo]
        )


def pairwise_jaccard_sim(mins, *, block: int = 512, col_block: int = 4096):
    """[N, s] sketch mins -> [N, N] positional-match similarity (fraction).
    Match counts are small integers, so i32 accumulation + one f64 divide is
    exact. Blocked in both dimensions: device memory stays at
    block*col_block*s regardless of N, and at most MAX_PENDING_BLOCKS result
    blocks live on device before the oldest is fetched."""
    mins = np.asarray(mins)
    n, s = mins.shape
    mp, nb = _pad_rows(mins, block)
    mc, nc = _pad_rows(mins, col_block)
    out = np.empty((nb * block, n), dtype=np.float64)
    post = lambda c: c / s
    pend = []
    for i in range(nb):
        a = mp[i * block : (i + 1) * block]
        for j in range(nc):
            b = mc[j * col_block : (j + 1) * col_block]
            pend.append((i, j, block, _jaccard_block(a, b)))
            _drain_oldest(pend, out, col_block, n, post, MAX_PENDING_BLOCKS)
    _drain_oldest(pend, out, col_block, n, post, 0)
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
    wnorm = wabs / wsum[:, None]  # exact-f64 row normalization
    mp, nb = _pad_rows(mins, block)
    wp, _ = _pad_rows(wnorm, block)
    mc, nc = _pad_rows(mins, col_block)
    out = np.empty((nb * block, n), dtype=np.float64)
    # dispatch blocks async, fetch behind a bounded window: strictly
    # per-block np.asarray would serialize dispatch -> device -> D2H per
    # block (the fixed per-roundtrip cost dominates at small N through a
    # remote runtime), while an unbounded window would hold the whole f32
    # result matrix on device (OOM risk at large N)
    post = lambda d: d
    pend = []
    for i in range(nb):
        a = mp[i * block : (i + 1) * block]
        wa = wp[i * block : (i + 1) * block]
        for j in range(nc):
            b = mc[j * col_block : (j + 1) * col_block]
            pend.append((i, j, block, _wjd_block(a, wa, b)))
            _drain_oldest(pend, out, col_block, n, post, MAX_PENDING_BLOCKS)
    _drain_oldest(pend, out, col_block, n, post, 0)
    return out[:n]
