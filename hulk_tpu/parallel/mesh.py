"""Device-mesh parallelism: data-parallel read sharding with exact psum
histogram merge, and model-parallel sharding of the CWS tables over sketch
slots.

The reference's parallelism is a single-host goroutine pool (SURVEY.md §2.3);
the TPU-native replacement is SPMD over a 2D mesh:

  * axis "dp": read batches sharded across chips; each shard computes a local
    spectrum histogram; psum merges them exactly (counts are integer-valued
    f64, and binning is deterministic), so N-shard output == 1-shard output.
  * axis "mp": the [s, nbins] CWS tables (the big state, ~233 MB at k=21)
    are sharded over sketch slots; the flush's per-slot update is
    embarrassingly parallel across slots, so no communication is needed
    until the final all_gather of the s-sized sketch/weights.

Multi-host: the same code runs under jax.distributed.initialize with a global
mesh; psum rides ICI within a slice and DCN across slices, emitted by XLA.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import hulk_tpu._jax_config  # noqa: F401
from hulk_tpu.hashes.jumphash_exact import jump_hash_exact_jnp
from hulk_tpu.ops.minimizer import minimizer_scan


def make_sketch_mesh(n_dp: int | None = None, n_mp: int = 1, devices=None) -> Mesh:
    devices = np.array(devices if devices is not None else jax.devices())
    total = devices.size
    if n_dp is None:
        n_dp = total // n_mp
    assert n_dp * n_mp == total, f"mesh {n_dp}x{n_mp} != {total} devices"
    return Mesh(devices.reshape(n_dp, n_mp), ("dp", "mp"))


def make_sharded_stream_step(
    mesh: Mesh,
    *,
    k: int,
    w: int,
    bucket: int,
    pallas: bool = False,
    use_kmv: bool = False,
    use_khf: bool = False,
    use_hmh: bool = False,
    hmh_pqr: tuple | None = None,
):
    """Data-parallel production stream step: reads sharded over dp, each
    shard maintaining its OWN histogram/count/secondary-sketch carries — no
    collectives per step (the merge is exact and happens once per interval on
    the host: integer histogram sum, KMV bottom-k union, KHF elementwise min,
    HMH register max). All carries are donated, so a stream of steps is pure
    async dispatch, exactly like the single-device path.

    Signature of the returned step:
        (hist [D,nbins] i32, count [D] i64, codes [R,L], lengths [R],
         kmv [D,s], khf [D,s], hmh [D,m])
        -> (hist, count, kmv, khf, hmh)
    Disabled sketches ride through as [D,1] dummies.
    """
    from hulk_tpu.ops.device_sketches import hmh_update, khf_update, kmv_update
    from hulk_tpu.ops.device_step import stream_step_body

    def local_step(hist, count, codes, lengths, kmv, khf, hmh):
        hist, count, kmv, khf, hmh = hist[0], count[0], kmv[0], khf[0], hmh[0]
        hist, count, svals = stream_step_body(
            hist, count, codes, lengths, k=k, w=w, bucket=bucket, pallas=pallas
        )
        if use_kmv:
            kmv = kmv_update(kmv, svals)
        if use_khf:
            khf = khf_update(khf, svals)
        if use_hmh:
            p, q, r = hmh_pqr
            hmh = hmh_update(hmh, svals, p=p, q=q, r=r)
        return hist[None], count[None], kmv[None], khf[None], hmh[None]

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp"), P("dp", None), P("dp"),
            P("dp", None), P("dp", None), P("dp", None),
        ),
        out_specs=(P("dp", None), P("dp"), P("dp", None), P("dp", None), P("dp", None)),
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 4, 5, 6))


def sharded_histogram_step(mesh: Mesh, nbins: int, k: int, w: int):
    """Build a pjit-ted step: [R, L] reads (sharded over dp) -> replicated
    histogram increment, merged with psum over dp."""

    def local_step(codes, lengths):
        vals, mask = minimizer_scan(codes, lengths, k=k, w=w)
        bins = jump_hash_exact_jnp(vals, nbins)
        hist = jnp.zeros((nbins,), dtype=jnp.int32)
        hist = hist.at[bins.reshape(-1)].add(mask.astype(jnp.int32).reshape(-1))
        hist = jax.lax.psum(hist, axis_name="dp")
        count = jax.lax.psum(jnp.sum(mask), axis_name="dp")
        return hist, count

    step = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P("dp", None), P("dp")),
            out_specs=(P(), P()),
        )
    )
    return step


def sharded_flush_step(mesh: Mesh, tables, decay_weight: float, apply_drift: bool, depth: int, width: int):
    """Build a pjit-ted flush: histogram (replicated) + sketch state sharded
    over mp (slots) -> updated sketch state.

    CMS runs replicated (tiny), the per-slot CWS update runs sharded over mp
    with zero communication; callers all_gather the [s] outputs implicitly by
    reading the replicated-out arrays.
    """

    def local_flush(hist, sketch_sh, weights_sh, c_sh, b_sh, er_sh):
        nbins = hist.shape[0]
        bin_ids = jnp.arange(nbins, dtype=jnp.uint64)
        row_bins = jnp.stack(
            [jump_hash_exact_jnp(bin_ids + jnp.uint64(d) * bin_ids, width) for d in range(depth)]
        ).T  # [nbins, depth]

        def body(carry, xs):
            cms, sketch, weights = carry
            freq, rb, jbin = xs
            freq = freq.astype(jnp.float64)
            live = freq != 0.0
            cms_in = jnp.where(live & apply_drift, cms * decay_weight, cms)
            rows = jnp.arange(depth)
            updated = cms_in.at[rows, rb].add(jnp.where(live, freq, 0.0))
            esti = updated[rows, rb].min()
            yka = jnp.exp(jnp.log(esti) - b_sh[:, jbin])
            aka = c_sh[:, jbin] / (yka * er_sh[:, jbin])
            cur = jnp.where(apply_drift, weights / decay_weight, weights)
            better = live & (aka < cur)
            sketch = jnp.where(better, jbin, sketch)
            weights = jnp.where(better, aka, weights)
            return (updated, sketch, weights), None

        cms0 = jnp.zeros((depth, width), dtype=jnp.float64)
        jbins = jnp.arange(nbins, dtype=jnp.int64)
        (cms, sketch_sh, weights_sh), _ = jax.lax.scan(
            body, (cms0, sketch_sh, weights_sh), (hist, row_bins, jbins)
        )
        return sketch_sh, weights_sh

    flush = jax.jit(
        jax.shard_map(
            local_flush,
            mesh=mesh,
            in_specs=(
                P(),            # histogram replicated
                P("mp"),        # sketch slots sharded
                P("mp"),        # weights sharded
                P("mp", None),  # c table sharded over slots
                P("mp", None),  # b table
                P("mp", None),  # exp_r table
            ),
            out_specs=(P("mp"), P("mp")),
        )
    )
    return flush


def shard_tables(mesh: Mesh, tables):
    """Place the CWS tables with slot-dim sharding over mp (replicated dp)."""
    sh = NamedSharding(mesh, P("mp", None))
    return (
        jax.device_put(tables.c, sh),
        jax.device_put(tables.b, sh),
        jax.device_put(tables.exp_r, sh),
    )
