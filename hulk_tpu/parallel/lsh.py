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
        # i32 match counts: exact, and ~100x faster on TPU than f64
        # accumulation (no f64 hardware). Chunked with lax.map so the
        # [Q, C, s] intermediate stays ~MBs however large the shard is.
        # Returned as u16 (s <= 65535 always): the [Q, N] result crosses
        # back to the host, and at 100k x 1k that is 200 MB instead of the
        # 1.6 GB an f64 matrix costs — the host does the one f64 divide,
        # bit-identical to dividing on device.
        nloc, s = index_rows.shape
        chunks = index_rows.reshape(nloc // _CHUNK, _CHUNK, s)

        def one(rows):
            eq = (queries[:, None, :] == rows[None, :, :]).astype(jnp.int32)
            return eq.sum(-1)  # [Q, C]

        counts = jax.lax.map(one, chunks)  # [m, Q, C]
        counts = jnp.moveaxis(counts, 0, 1).reshape(queries.shape[0], nloc)
        return counts.astype(jnp.uint16)  # [Q, N_shard]

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


def _candidate_sims(forest, query_mins: np.ndarray, cands=None):
    """LSH candidates per query + their exact positional similarities.

    The LSH tables already narrow each query to a handful of candidates, so
    similarity is computed ONLY at candidate positions (vectorised over the
    flattened (query, candidate) pair list) — same f64 value the device
    ranking produces (integer match count / s), without materialising or
    transferring a [Q, N] matrix. Returns (cands list, sims list)."""
    mins = forest.mins_matrix
    if cands is None:
        cands = [forest.candidates(query_mins[qi]) for qi in range(query_mins.shape[0])]
    qi_flat = np.repeat(np.arange(len(cands)), [c.size for c in cands])
    c_flat = np.concatenate(cands) if cands else np.empty(0, dtype=np.int64)
    if c_flat.size == 0:
        return cands, [np.empty(0)] * len(cands)
    counts = (
        query_mins[qi_flat].astype(np.uint64) == mins[c_flat.astype(np.intp)]
    ).sum(axis=1)
    sims_flat = counts.astype(np.float64) / query_mins.shape[-1]
    splits = np.cumsum([c.size for c in cands])[:-1]
    return cands, np.split(sims_flat, splits)


# Candidate-set density above which the batched device ranking beats the
# host vectorised candidate scoring: scoring cost is ~Q*N*s either way at
# this density, but the device matmul runs at ~10^9 cells/s vs ~10^7 on
# host, so the crossover is early; 25% leaves margin for the [Q, N]
# transfer cost through a remote runtime.
_DEVICE_RANK_DENSITY = 0.25


def sharded_lsh_search(mesh: Mesh, forest, query_mins: np.ndarray, thresh: float | None = None):
    """Full LSH search: host candidate filter + exact candidate-only
    similarity (see _candidate_sims). When the candidate sets are a large
    fraction of the corpus (low thresholds make banding unselective), the
    per-candidate host scoring degenerates to an O(Q*N*s) host pass — the
    `mesh` then engages the sharded device ranking (sharded_sims) and the
    candidate similarities are read out of the [Q, N] device matrix
    instead. Both paths produce the identical f64 value (integer match
    count / s), so results do not depend on which engaged."""
    t = forest.jaccard_thresh if thresh is None else thresh
    mins = forest.mins_matrix
    n = mins.shape[0]
    cands = [forest.candidates(query_mins[qi]) for qi in range(query_mins.shape[0])]
    total_cand = sum(c.size for c in cands)
    if (
        mesh is not None
        and n > 0
        and query_mins.shape[0] > 0
        and total_cand >= _DEVICE_RANK_DENSITY * query_mins.shape[0] * n
    ):
        sims_full, _ = sharded_sims(mesh, forest, query_mins)
        csims = [sims_full[qi, c.astype(np.intp)] for qi, c in enumerate(cands)]
    else:
        cands, csims = _candidate_sims(forest, query_mins, cands)
    out = []
    for qi in range(query_mins.shape[0]):
        cand, s = cands[qi], csims[qi]
        keep = s >= t
        order = np.argsort(-s[keep])
        kept = cand[keep][order]
        out.append([(forest.names[i], float(v)) for i, v in zip(kept, s[keep][order])])
    return out


def sharded_sims(mesh: Mesh, forest, query_mins: np.ndarray):
    """Device-ranked [Q, N] similarity matrix for a forest's corpus (the
    brute-force reference the LSH filter narrows); returns (sims, N)."""
    dev_index, n = shard_index_mins(mesh, forest.mins_matrix)
    rank = sharded_similarity(mesh)
    q = jnp.asarray(query_mins.astype(np.int64))
    counts = np.asarray(rank(q, dev_index))[:, :n]
    return counts.astype(np.float64) / query_mins.shape[-1], n


def multiprocess_lsh_search(forest, query_mins: np.ndarray,
                            local_ids: np.ndarray, thresh: float | None = None,
                            topk: int = 64):
    """Cross-process sharded search (BASELINE config 5 at scale): every
    process owns the corpus stripe it indexed (its `forest`, with
    `local_ids` giving each local row's global id), filters its stripe with
    its LSH tables, computes exact candidate-only similarities, and keeps
    its top-K per query. One small allgather of the fixed [Q, K] (id, sim)
    blocks then merges identically on every process — the only
    cross-process traffic, ~Q*K*16 bytes per process regardless of corpus
    size.

    Exactness: banding is per-row, so the union of per-stripe candidate
    sets IS the whole-corpus candidate set, and the merged result equals
    the single-process search wherever K bounds nothing (proven in
    tests/test_distributed.py). Returns [(global_id, sim), ...] per query,
    sorted by similarity (ties by id)."""
    import jax

    from hulk_tpu.parallel import distributed as dist

    t = forest.jaccard_thresh if thresh is None else thresh
    Q = query_mins.shape[0]
    cands, csims = _candidate_sims(forest, query_mins)
    ids_out = np.full((Q, topk), -1, dtype=np.int64)
    sims_out = np.zeros((Q, topk), dtype=np.float64)
    for qi in range(Q):
        cand, s = cands[qi], csims[qi]
        if not cand.size:
            continue
        keep = s >= t
        sel, sv = cand[keep], s[keep]
        order = np.lexsort((local_ids[sel], -sv))[:topk]
        ids_out[qi, : order.size] = local_ids[sel][order]
        sims_out[qi, : order.size] = sv[order]
    if jax.process_count() > 1:
        gid = dist.allgather(ids_out).reshape(-1, Q, topk)
        gsim = dist.allgather(sims_out).reshape(-1, Q, topk)
    else:
        gid, gsim = ids_out[None], sims_out[None]
    out = []
    for qi in range(Q):
        ids = gid[:, qi, :].reshape(-1)
        sv = gsim[:, qi, :].reshape(-1)
        live = ids >= 0
        ids, sv = ids[live], sv[live]
        order = np.lexsort((ids, -sv))
        out.append([(int(i), float(v)) for i, v in zip(ids[order], sv[order])])
    return out
