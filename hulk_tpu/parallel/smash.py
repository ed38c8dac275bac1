"""Sharded / multi-host all-pairs smash.

The reference computes the N x N weighted-Jaccard matrix with a scalar
nested loop on one core (cmd/smash.go:183-226). Here the matrix row blocks
shard over the dp mesh: each device runs the SAME normalized-f32 scan
kernel as the single-device blocked path (ops/distance.wjd_block_body) on
its slice of rows against replicated columns, so every cell's
floating-point math is identical to the single-device path — which keeps
the CLI's boundary-cell host recheck (margin wjd_recheck_margin(s))
sufficient for reference-CSV-exactness at any device count.

Multi-host: each process loads only its shard of sketch JSONs
(parallel/distributed.process_read_shard interleaving), the [n_i, s]
mins+weights allgather across processes (exact u64/f64 byte transport via
jax.experimental.multihost_utils), each process computes a contiguous
row-slice with its local devices, and the slices allgather so every
process holds the full matrix (process 0 writes the CSV).
"""
from __future__ import annotations

import numpy as np

import hulk_tpu._jax_config  # noqa: F401


def _mesh_and_fn(ndev: int):
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from hulk_tpu.ops.distance import wjd_block_body
    from hulk_tpu.parallel.mesh import make_sketch_mesh

    # LOCAL devices only: each process computes its own row stripe; under
    # multi-process a global-device mesh would make the output span
    # non-addressable shards
    mesh = make_sketch_mesh(n_dp=ndev, n_mp=1, devices=jax.local_devices()[:ndev])
    fn = jax.jit(
        shard_map(
            wjd_block_body,
            mesh=mesh,
            in_specs=(P("dp", None), P("dp", None), P(None, None)),
            out_specs=P("dp", None),
        )
    )
    return mesh, fn


def _pad_rows_to(x: np.ndarray, m: int) -> np.ndarray:
    p = (-x.shape[0]) % m
    return np.pad(x, ((0, p),) + ((0, 0),) * (x.ndim - 1)) if p else x


def sharded_wjd_rows(mins, weights, lo: int, hi: int, *, ndev: int | None = None,
                     block: int = 512, col_block: int = 4096) -> np.ndarray:
    """Rows [lo, hi) of the [N, N] weighted-Jaccard distance matrix
    (reference subject-weights semantics), row blocks sharded over the
    local dp mesh. Cells are bit-identical to the single-device blocked
    kernel: the body is the same and sharding only partitions the batch
    dimension."""
    import jax

    if ndev is None:
        ndev = len(jax.local_devices())
    mins = np.asarray(mins)
    weights = np.asarray(weights)
    n, s = mins.shape
    wabs = np.abs(weights)
    wsum = np.maximum(wabs.sum(-1), 1e-300)
    wnorm = wabs / wsum[:, None]  # exact-f64 row normalization
    _, fn = _mesh_and_fn(ndev)
    row_step = -(-block // ndev) * ndev  # block rounded up to a dp multiple

    nr = hi - lo
    out = np.empty((nr, n), dtype=np.float64)
    mp = _pad_rows_to(mins[lo:hi], row_step)
    wp = _pad_rows_to(wnorm[lo:hi], row_step)

    def drain(pend, keep):
        # bounded in-flight window (see ops/distance.MAX_PENDING_BLOCKS):
        # dispatch stays async, un-fetched device results stay O(cap)
        while len(pend) > keep:
            i, j, cb, d = pend.pop(0)
            hi_r = min(i + row_step, nr)
            out[i:hi_r, j : j + cb] = np.asarray(d)[: hi_r - i]

    from hulk_tpu.ops.distance import MAX_PENDING_BLOCKS

    pend = []
    for i in range(0, mp.shape[0], row_step):
        a = mp[i : i + row_step]
        wa = wp[i : i + row_step]
        for j in range(0, n, col_block):
            pend.append((i, j, mins[j : j + col_block].shape[0],
                         fn(a, wa, mins[j : j + col_block])))
            drain(pend, MAX_PENDING_BLOCKS)
    drain(pend, 0)
    return out


def sharded_pairwise_wjd(mins, weights, *, ndev: int | None = None,
                         block: int = 512, col_block: int = 4096) -> np.ndarray:
    """Full [N, N] matrix on the local devices (single process)."""
    return sharded_wjd_rows(
        mins, weights, 0, np.asarray(mins).shape[0], ndev=ndev, block=block,
        col_block=col_block,
    )


def distributed_pairwise_wjd(local_mins, local_weights, *, block: int = 512,
                             col_block: int = 4096):
    """Multi-process all-pairs: allgather each process's [n_i, s]
    mins+weights (variable n_i; padded then unpacked), compute this
    process's contiguous row-slice on its local devices, allgather the
    slices. Returns ([N, s] mins, [N, s] weights, [N, N] matrix), identical
    on every process and ordered by global sorted file order when callers
    shard files with parallel/distributed.process_read_shard (which hands
    process p the sorted files p, p+nproc, ...)."""
    import jax
    from jax.experimental import multihost_utils as mh

    local_mins = np.asarray(local_mins, dtype=np.int64)
    local_weights = np.asarray(local_weights, dtype=np.float64)
    nproc = jax.process_count()
    pid = jax.process_index()
    s = local_mins.shape[1]
    counts = mh.process_allgather(
        np.array([local_mins.shape[0]], dtype=np.int64)
    ).reshape(-1)
    nmax = int(counts.max())
    g_m = np.asarray(mh.process_allgather(_pad_rows_to(local_mins, nmax) if local_mins.shape[0] else np.zeros((nmax, s), np.int64)))
    g_w = np.asarray(mh.process_allgather(_pad_rows_to(local_weights, nmax) if local_weights.shape[0] else np.zeros((nmax, s), np.float64)))

    # undo the round-robin file sharding: local index i on process p is
    # global sorted index i*nproc + p
    n = int(counts.sum())
    mins = np.empty((n, s), dtype=np.int64)
    weights = np.empty((n, s), dtype=np.float64)
    for p in range(nproc):
        idx = np.arange(int(counts[p])) * nproc + p
        mins[idx] = g_m[p, : counts[p]]
        weights[idx] = g_w[p, : counts[p]]

    lo = (n * pid) // nproc
    hi = (n * (pid + 1)) // nproc
    my = sharded_wjd_rows(mins, weights, lo, hi, block=block,
                          col_block=col_block)
    stripe = -(-n // nproc)
    padded = np.zeros((stripe, n), dtype=np.float64)
    padded[: hi - lo] = my
    g_rows = np.asarray(mh.process_allgather(padded))
    out = np.empty((n, n), dtype=np.float64)
    for p in range(nproc):
        plo = (n * p) // nproc
        phi = (n * (p + 1)) // nproc
        out[plo:phi] = g_rows[p, : phi - plo]
    return mins, weights, out
