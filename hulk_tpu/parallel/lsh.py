"""Sharded LSH-Forest similarity search (BASELINE config 5).

The index's [N, s] sketch matrix is sharded row-wise over the dp axis of the
device mesh (N can be far beyond one chip's memory at 100k+ sketches); the
[Q, s] query block is replicated — the all-gather of queries happens once on
placement, not per shard — and every shard ranks its rows locally with the
positional-match kernel. Results come back as a [Q, N] similarity matrix laid
out to match the global index order, so the host applies the LSH candidate
mask and threshold. Multi-host: identical code under a global mesh with
jax.distributed; the only collective is the implicit query broadcast.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import hulk_tpu._jax_config  # noqa: F401


_CHUNK = 4096  # rows ranked per step: bounds the [Q, C, s] intermediate


def shard_index_mins(mesh: Mesh, mins: np.ndarray):
    """Place [N, s] index rows sharded over dp. N pads to dp*_CHUNK so every
    shard is a whole number of ranking chunks and global row order is
    preserved (padding sits only at the global tail)."""
    n_dp = mesh.shape["dp"]
    n = mins.shape[0]
    pad = (-n) % (n_dp * _CHUNK)
    padded = np.vstack([mins, np.zeros((pad, mins.shape[1]), dtype=mins.dtype)])
    sh = NamedSharding(mesh, P("dp", None))
    return jax.device_put(padded.astype(np.int64), sh), n


_rank_cache: dict = {}


def sharded_similarity(mesh: Mesh):
    """Build a jitted [Q, s] x sharded [N, s] -> [Q, N] similarity matmul.
    Cached per mesh so repeated searches reuse the compiled executable."""
    key = (tuple(map(id, mesh.devices.flat)), mesh.axis_names)
    if key in _rank_cache:
        return _rank_cache[key]

    def local_rank(queries, index_rows):
        # i32 match counts + one f64 divide: exact, and ~100x faster on TPU
        # than f64 accumulation (no f64 hardware). Chunked with lax.map so
        # the [Q, C, s] intermediate stays ~MBs however large the shard is.
        nloc, s = index_rows.shape
        chunks = index_rows.reshape(nloc // _CHUNK, _CHUNK, s)

        def one(rows):
            eq = (queries[:, None, :] == rows[None, :, :]).astype(jnp.int32)
            return eq.sum(-1)  # [Q, C]

        counts = jax.lax.map(one, chunks)  # [m, Q, C]
        counts = jnp.moveaxis(counts, 0, 1).reshape(queries.shape[0], nloc)
        return counts.astype(jnp.float64) / queries.shape[-1]  # [Q, N_shard]

    fn = jax.jit(
        jax.shard_map(
            local_rank,
            mesh=mesh,
            in_specs=(P(), P("dp", None)),
            out_specs=P(None, "dp"),
        )
    )
    _rank_cache[key] = fn
    return fn


def sharded_lsh_search(mesh: Mesh, forest, query_mins: np.ndarray, thresh: float | None = None):
    """Full sharded search: device ranking + host LSH candidate filter."""
    t = forest.jaccard_thresh if thresh is None else thresh
    dev_index, n = shard_index_mins(mesh, forest.mins_matrix)
    rank = sharded_similarity(mesh)
    q = jnp.asarray(query_mins.astype(np.int64))
    sims = np.asarray(rank(q, dev_index))[:, :n]  # [Q, N]
    out = []
    for qi in range(query_mins.shape[0]):
        cand = forest.candidates(query_mins[qi])
        s = sims[qi, cand] if cand.size else np.empty(0)
        keep = s >= t
        order = np.argsort(-s[keep])
        kept = cand[keep][order]
        out.append([(forest.names[i], float(v)) for i, v in zip(kept, s[keep][order])])
    return out
