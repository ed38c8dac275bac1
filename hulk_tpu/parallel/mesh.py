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
    packed4: bool = False,
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
    from hulk_tpu.ops.device_step import (
        bottom_k_values,
        fused_bits_ok,
        stream_step_body,
        stream_step_fused_body,
    )

    def local_step(hist, count, codes, lengths, kmv, khf, hmh):
        hist, count, kmv, khf, hmh = hist[0], count[0], kmv[0], khf[0], hmh[0]
        if packed4:
            from hulk_tpu.ops.device_step import unpack_codes4

            codes = unpack_codes4(codes)
        fused = fused_bits_ok(k, codes.shape[0])
        body = stream_step_fused_body if fused else stream_step_body
        hist, count, svals = body(
            hist, count, codes, lengths, k=k, w=w, bucket=bucket, pallas=pallas
        )
        if use_kmv:
            kmv_in = bottom_k_values(svals, kmv.shape[0]) if fused else svals
            kmv = kmv_update(kmv, kmv_in)
        if use_khf:
            khf = khf_update(khf, svals)
        if use_hmh:
            p, q, r = hmh_pqr
            hmh = hmh_update(hmh, svals, p=p, q=q, r=r)
        return hist[None], count[None], kmv[None], khf[None], hmh[None]

    # check_vma=False: pallas_call inside shard_map cannot express output
    # VMA in this jax version (ShapeDtypeStruct vma=None is rejected with
    # check_vma=True on real TPU — CPU dryruns never engage Pallas, which
    # is why only hardware runs hit it). Correctness is unaffected: every
    # in/out is explicitly dp-sharded with no cross-shard communication.
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp"), P("dp", None), P("dp"),
            P("dp", None), P("dp", None), P("dp", None),
        ),
        out_specs=(P("dp", None), P("dp"), P("dp", None), P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 4, 5, 6))


def make_sharded_group_step(
    mesh: Mesh,
    *,
    g: int,
    r: int,
    l: int,
    k: int,
    w: int,
    bucket: int,
    pallas: bool = False,
    use_kmv: bool = False,
    use_khf: bool = False,
    use_hmh: bool = False,
    hmh_pqr: tuple | None = None,
    packed2: bool = False,
    compact: bool = False,
):
    """Data-parallel GROUPED stream step: each dp shard consumes its own flat
    transfer buffer (nibble or v2 2-bit layout, g sub-batches of r reads)
    with the same single-dispatch lax.scan the single-device stream runs —
    one transfer + one dispatch per group PER SHARD, per-shard donated
    carries, zero per-step collectives (the merge stays on the host at
    interval boundaries, exactly as before).

    Signature: (hist [D,nbins], count [D], kmv [D,s], khf [D,s], hmh [D,m],
                flat [D, flatlen] u8) -> carries; flat is row-sharded over dp
    (each row built host-side by native.pack_group/pack_group2 from that
    shard's slice of the batch rows)."""
    from hulk_tpu.ops.device_step import group_scan_body

    def local(hist, count, kmv, khf, hmh, flat):
        h, c, s1, s2, hm = group_scan_body(
            hist[0], count[0], kmv[0], khf[0], hmh[0], flat[0],
            g=g, r=r, l=l, k=k, w=w, bucket=bucket, pallas=pallas,
            use_kmv=use_kmv, use_khf=use_khf, use_hmh=use_hmh,
            hmh_pqr=hmh_pqr, packed2=packed2, compact=compact,
        )
        return h[None], c[None], s1[None], s2[None], hm[None]

    # check_vma=False: see make_sharded_stream_step (Pallas inside
    # shard_map on real TPU)
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp"), P("dp", None), P("dp", None),
            P("dp", None), P("dp", None),
        ),
        out_specs=(
            P("dp", None), P("dp"), P("dp", None), P("dp", None),
            P("dp", None),
        ),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2, 3, 4))


def sharded_histogram_step(mesh: Mesh, nbins: int, k: int, w: int):
    """Build a pjit-ted step: [R, L] reads (sharded over dp) -> replicated
    histogram increment, merged with psum over dp."""

    def local_step(codes, lengths):
        vals, mask = minimizer_scan(codes, lengths, k=k, w=w)
        bins = jump_hash_exact_jnp(vals, nbins)
        hist = jnp.zeros((nbins,), dtype=jnp.int32)  # splat zeros: cheap constant
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


def sharded_flush_step(mesh: Mesh, decay_weight: float, apply_drift: bool, depth: int, width: int):
    """Build a pjit-ted flush over the mesh: histogram + CMS replicated,
    sketch state and CWS tables sharded over mp (slots); zero communication.

    Signature of the returned step:
        (hist [nbins] i32/f64, row_bins [depth, nbins] i32, cms [depth,width],
         sketch [s], weights [s], c/b/exp_r [s, nbins])
        -> (cms, sketch, weights)
    CMS state is an explicit carry so interval flushes compose like the
    reference's persistent CountMinSketch.

    Drift decision record (round 5): the drift path below exists for the
    mesh-scale building-block role only — measured 2.31 s on v5e vs 0.47 s
    for the overlapped host native flush at 194k used bins, and the drift
    selection is order-dependent (see docs/PERF.md "Decision record: no
    drift-mode device flush"), so no production path selects it.

    Without drift the flush is FULLY PARALLEL — no per-element scan. The only
    cross-element dependency in the reference loop is the CMS counter state,
    and counters are sums of integer-valued f64 frequencies (exact under any
    grouping), so every post-increment estimate is a grouped prefix-sum:
    per row, sort positions by counter cell, cumsum, subtract each segment's
    base, add the carried-in cell value. The CWS replace-if-strictly-smaller
    scan per slot equals min + FIRST argmin (elements arrive in ascending bin
    order, argmin returns the first minimum). With drift, counters decay
    between elements (not plain sums), so that path keeps the sequential
    lax.scan with the same subnormal squash as the host flush.

    Exactness decision (VERDICT r1 item 3): the host native flush remains the
    single-host production path — bit-exact Go exp/log, parallel, and fully
    overlapped with device streaming (pipeline.py), so it costs ~nothing.
    This device flush is for mesh-scale operation; it uses XLA exp/log, whose
    ~1 ULP slack can in principle flip a CWS argmin at an exact FP boundary.
    tests/test_parallel.py sweeps fixture+random corpora asserting identical
    sketch bins and CSV-precision-identical weights.
    """

    def local_flush(hist, row_bins, cms, sketch_sh, weights_sh, c_sh, b_sh, er_sh):
        freqs = hist.astype(jnp.float64)
        live = freqs != 0.0

        if not apply_drift:
            def row_prefix(keys, cms_row):
                order = jnp.argsort(keys, stable=True)
                ks = keys[order]
                fs = freqs[order]
                cs = jnp.cumsum(fs)
                segst = jnp.concatenate(
                    [jnp.ones_like(ks[:1], dtype=bool), ks[1:] != ks[:-1]]
                )
                base = jnp.where(segst, cs - fs, -jnp.inf)
                base = jax.lax.cummax(base)
                pre = cs - base + cms_row[ks]
                out = jnp.zeros_like(pre).at[order].set(pre)
                return out, cms_row.at[keys].add(freqs)

            estis, new_rows = [], []
            for d in range(depth):
                e, nr = row_prefix(row_bins[d], cms[d])
                estis.append(e)
                new_rows.append(nr)
            esti = jnp.stack(estis).min(axis=0)
            cms_out = jnp.stack(new_rows)

            lf = jnp.log(jnp.where(live, esti, 1.0))
            aka = c_sh / (jnp.exp(lf[None, :] - b_sh) * er_sh)
            aka = jnp.where(live[None, :], aka, jnp.inf)
            s_loc = aka.shape[0]
            best = jnp.argmin(aka, axis=1)
            best_aka = aka[np.arange(s_loc), best]
            better = best_aka < weights_sh
            sketch_sh = jnp.where(better, best.astype(sketch_sh.dtype), sketch_sh)
            weights_sh = jnp.where(better, best_aka, weights_sh)
            return cms_out, sketch_sh, weights_sh

        tiny = np.float64(np.finfo(np.float64).tiny)
        nbins = hist.shape[0]

        def body(carry, xs):
            cms_c, sketch, weights = carry
            freq, rb, jbin = xs
            live_e = freq != 0.0
            scaled = cms_c * decay_weight
            scaled = jnp.where(scaled >= tiny, scaled, 0.0)  # subnormal squash
            cms_in = jnp.where(live_e, scaled, cms_c)
            rows = np.arange(depth)
            updated = cms_in.at[rows, rb].add(jnp.where(live_e, freq, 0.0))
            esti = updated[rows, rb].min()
            yka = jnp.exp(jnp.log(esti) - b_sh[:, jbin])
            aka = c_sh[:, jbin] / (yka * er_sh[:, jbin])
            cur = weights / decay_weight
            better = live_e & (aka < cur)
            sketch = jnp.where(better, jbin, sketch)
            weights = jnp.where(better, aka, weights)
            return (updated, sketch, weights), None

        jbins = np.arange(nbins, dtype=np.int64)
        (cms, sketch_sh, weights_sh), _ = jax.lax.scan(
            body, (cms, sketch_sh, weights_sh), (freqs, row_bins.T, jbins)
        )
        return cms, sketch_sh, weights_sh

    flush = jax.jit(
        jax.shard_map(
            local_flush,
            mesh=mesh,
            in_specs=(
                P(),            # histogram replicated
                P(),            # row_bins replicated
                P(),            # cms replicated
                P("mp"),        # sketch slots sharded
                P("mp"),        # weights sharded
                P("mp", None),  # c table sharded over slots
                P("mp", None),  # b table
                P("mp", None),  # exp_r table
            ),
            out_specs=(P(), P("mp"), P("mp")),
        )
    )
    return flush


# Relative margin bound for the production device flush's argmin recheck.
# XLA's f64 log/exp are within ~2 ULP (~4.4e-16 relative) each, so a
# device-computed Aka is within ~1e-15 of the exact fdlibm value; 1e-12
# leaves 3 orders of magnitude of slack. Any element whose device Aka lies
# within this margin of the winning Aka is surfaced as a candidate; if more
# than TOP_T fit the margin the flush reports overflow and the caller falls
# back to the full exact host flush (never observed; the bound exists to
# make the exactness claim a THEOREM rather than an expectation).
FLUSH_MARGIN_REL = 1e-12
FLUSH_TOP_T = 8


def make_device_flush_candidates(mesh: Mesh, depth: int, width: int,
                                 top_t: int = FLUSH_TOP_T):
    """PRODUCTION no-drift device flush, device stage.

    The CMS update and every per-element frequency estimate are EXACT on
    device (integer-valued f64 sums under the grouped prefix-sum — see
    sharded_flush_step's derivation); only the CWS transform
    Aka = c/(exp(log(esti)-b)*exp_r) uses XLA's exp/log (~1 ULP off the Go
    fdlibm semantics). Instead of trusting the device argmin, this stage
    returns per sketch slot the TOP_T candidate elements by device Aka plus
    a margin count; the host stage (sketch/histosketch.exact_flush_select)
    recomputes those few Akas with the bit-exact Go ports and applies the
    reference's replace-if-strictly-smaller selection. Bit-identity holds
    whenever margin_count <= top_t (else the caller falls back to the host
    flush; see FLUSH_MARGIN_REL).

    Returns a jitted fn:
        (hist [nbins] i32/f64, row_bins [depth, nbins] i32,
         cms [depth, width] f64, c/b/exp_r [s, nbins] sharded over mp)
        -> (cms_out [depth, width],
            cand_bins [s, T] i64, cand_esti [s, T] f64,
            cand_live [s, T] bool, margin_count [s] i32)
    """

    def local_flush(hist, row_bins, cms, c_sh, b_sh, er_sh):
        freqs = hist.astype(jnp.float64)
        live = freqs != 0.0

        def row_prefix(keys, cms_row):
            order = jnp.argsort(keys, stable=True)
            ks = keys[order]
            fs = freqs[order]
            cs = jnp.cumsum(fs)
            segst = jnp.concatenate(
                [jnp.ones_like(ks[:1], dtype=bool), ks[1:] != ks[:-1]]
            )
            base = jnp.where(segst, cs - fs, -jnp.inf)
            base = jax.lax.cummax(base)
            pre = cs - base + cms_row[ks]
            out = jnp.zeros_like(pre).at[order].set(pre)
            return out, cms_row.at[keys].add(freqs)

        estis, new_rows = [], []
        for d in range(depth):
            e, nr = row_prefix(row_bins[d], cms[d])
            estis.append(e)
            new_rows.append(nr)
        esti = jnp.stack(estis).min(axis=0)
        cms_out = jnp.stack(new_rows)

        lf = jnp.log(jnp.where(live, esti, 1.0))
        aka = c_sh / (jnp.exp(lf[None, :] - b_sh) * er_sh)
        aka = jnp.where(live[None, :], aka, jnp.inf)
        neg_top, idx = jax.lax.top_k(-aka, top_t)  # smallest akas, ties by index
        best = -neg_top[:, 0]
        # sign-safe margin: best + |best|*rel (+tiny for best == 0)
        thresh = best + jnp.abs(best) * FLUSH_MARGIN_REL + 1e-300
        margin = jnp.sum(aka <= thresh[:, None], axis=1).astype(jnp.int32)
        cand_bins = idx.astype(jnp.int64)
        cand_esti = esti[idx]
        cand_live = live[idx]
        return cms_out, cand_bins, cand_esti, cand_live, margin

    return jax.jit(
        jax.shard_map(
            local_flush,
            mesh=mesh,
            in_specs=(
                P(), P(), P(),
                P("mp", None), P("mp", None), P("mp", None),
            ),
            out_specs=(
                P(), P("mp", None), P("mp", None), P("mp", None), P("mp"),
            ),
        )
    )


def shard_tables(mesh: Mesh, tables):
    """Place the CWS tables with slot-dim sharding over mp (replicated dp)."""
    sh = NamedSharding(mesh, P("mp", None))
    return (
        jax.device_put(tables.c, sh),
        jax.device_put(tables.b, sh),
        jax.device_put(tables.exp_r, sh),
    )
