"""Fully-jitted device compute: the streaming sketch steps.

The streaming step (minimizers -> jump binning -> histogram scatter) is
integer-exact and bit-matches the host path on any backend; on TPU the jump
hash and the minimizer window run as Pallas kernels. The histogram is a
donated carry: steps accumulate on device with no host roundtrips, and
data-parallel shards each own their carry (exact host merge once per
interval; see parallel/mesh.py, which also holds the mesh-scale device
flush).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import hulk_tpu._jax_config  # noqa: F401
from hulk_tpu.hashes.jumphash_exact import jump_hash_exact_jnp
from hulk_tpu.ops.minimizer import minimizer_scan, minimizer_window


def pallas_supported() -> bool:
    """True when the default backend compiles Mosaic (Pallas TPU) kernels."""
    return jax.default_backend() == "tpu"


def _jump_bins(keys, nbins: int, pallas: bool):
    """Exact Go jump hash: Pallas TPU kernel (3.2x the XLA while-loop at
    262k lanes, measured v5e) or the XLA integer-emulated loop. Both are
    bit-equal to the Go semantics (tests/test_jump_pallas.py, test_hashes.py).
    """
    if pallas:
        from hulk_tpu.ops.jump_pallas import jump_hash_tpu

        return jump_hash_tpu(keys, nbins)
    return jump_hash_exact_jnp(keys, nbins)


@partial(jax.jit, static_argnames=("k", "w", "pallas"), donate_argnums=(0,))
def sketch_accumulate_step(hist, codes, lengths, *, k: int, w: int, pallas: bool = False):
    """One streaming step: histogram += binned minimizers of this batch.

    hist: [nbins] int32 (donated; counts are exact integers — the host
    converts to the reference's float64 spectrum losslessly). Uses the
    integer-emulated jump hash so binning is bit-exact on TPU, where native
    f64 divide is not correctly rounded. Returns (hist, n_minimizers).
    """
    nbins = hist.shape[0]
    vals, mask = minimizer_scan(codes, lengths, k=k, w=w, pallas=pallas)
    bins = _jump_bins(vals.reshape(-1), nbins, pallas)
    contrib = mask.astype(jnp.int32)
    hist = hist.at[bins].add(contrib.reshape(-1))
    return hist, jnp.sum(mask)


@partial(jax.jit, static_argnames=("k", "w"))
def minimizer_values_step(codes, lengths, *, k: int, w: int):
    """Per-read distinct minimizer values + mask (for KMV/KHF feeds)."""
    return minimizer_scan(codes, lengths, k=k, w=w)


# ---- compacted streaming step (the fast path) -----------------------------
#
# ~84% of [R, L] lanes are dead (padding / duplicate positions), but the
# jump-hash while-loop pays full width until the slowest live lane converges.
# Sorting the flattened values pushes all live values to the front (dead
# lanes carry the U64MAX sentinel), the host reads the live count (a scalar)
# and dispatches binning+scatter on the smallest bucket that covers it —
# a 4-6x reduction in jump-hash/scatter width at the cost of one cheap sort.
# The sentinel is safe for every legal (k, w): a reported minimizer can never
# equal U64MAX (proof in ops/minimizer.py — the reference only reports at
# positions whose own entry has low byte = span in [1, 31]).

_U64SENT = np.uint64(0xFFFFFFFFFFFFFFFF)  # np scalar (device scalars cost a D2H sync per lowering)


@partial(jax.jit, static_argnames=("k", "w"))
def minimizer_sorted_flat(codes, lengths, *, k: int, w: int):
    """-> (sorted flat values with U64MAX sentinels, live count)."""
    vals, mask = minimizer_scan(codes, lengths, k=k, w=w)
    flat = jnp.where(mask, vals, _U64SENT).reshape(-1)
    return jnp.sort(flat), jnp.sum(mask)


@partial(jax.jit, static_argnames=("pallas",), donate_argnums=(0,))
def bin_scatter_slice(hist, svals, *, pallas: bool = False):
    """Bin a compacted slice and scatter-add into the histogram.

    Dead sentinel lanes are remapped to key 0, which converges in one jump
    iteration and scatters with weight 0.
    """
    nbins = hist.shape[0]
    live = svals != _U64SENT
    keys = jnp.where(live, svals, np.uint64(0))
    bins = _jump_bins(keys, nbins, pallas)
    hist = hist.at[bins].add(live.astype(jnp.int32))
    return hist


def live_bucket(count: int, total: int, r: int) -> int:
    """Smallest padded slice size covering `count` live values."""
    b = max(16 * r, 1024)
    while b < count:
        b *= 2
    return min(b, total)


def stream_bucket(r: int, total: int, *, l: int | None = None,
                  k: int | None = None, w: int | None = None) -> int:
    """Static compaction bucket for the sync-free stream step.

    With (l, k, w) known, the per-read width sizes from the density mean
    m = 2(l-k+1)/(w+1) — itself a slight OVERestimate of true live lanes
    (measured 27.1 vs m=28 at 150 bp/k21/w9) — times 1.03, plus ceil(64/r)
    absolute slack for small batches. The batch SUM concentrates hard
    (sd ~ 3*sqrt(r) lanes), so the margin is tens of sigma at production
    r; a 28-32/read sweep on v5e measured the jump+scatter width as the
    last stream lever (1.80M -> 1.92M reads/s at the production shape).
    This also fixes a silent cliff the old fixed 32/read had: any bucket
    whose density mean exceeds it (1 kb reads at any k; 256 bp reads at
    small k) landed EVERY batch on the full-width fallback. Denser-than-
    expected batches still take the exact full-width branch via the
    in-kernel cond. Without (l, k, w) (legacy callers) the measured
    32/read stands."""
    if l is None or k is None or w is None:
        return min(32 * r, total)
    per = max(
        16,
        (2 * max(l - k + 1, 0) * 103) // ((w + 1) * 100) + 1 + (-(-64 // r)),
    )
    return min(per * r, total)


def stream_step_body(hist, count, codes, lengths, *, k: int, w: int, bucket: int,
                     pallas: bool = False):
    """Unjitted body of sketch_stream_step — reused inside shard_map by the
    data-parallel stream (parallel/mesh.make_sharded_stream_step). With
    pallas=True both the minimizer window and the jump hash run as Mosaic
    kernels, so large k (>= 25 at R=8192), which cannot take the fused
    single-sort step, keeps the Pallas hot path."""
    vals, mask = minimizer_scan(codes, lengths, k=k, w=w, pallas=pallas)
    cnt = jnp.sum(mask)
    flat = jnp.where(mask, vals, _U64SENT).reshape(-1)
    svals = jnp.sort(flat)

    if bucket >= flat.shape[0]:
        hist = bin_scatter_slice(hist, svals, pallas=pallas)
    else:
        hist = jax.lax.cond(
            cnt <= bucket,
            lambda h: bin_scatter_slice(
                h, jax.lax.slice(svals, (0,), (bucket,)), pallas=pallas
            ),
            lambda h: bin_scatter_slice(h, svals, pallas=pallas),
            hist,
        )
    return hist, count + cnt.astype(count.dtype), svals


# ---- fused single-sort streaming step --------------------------------------
#
# The two-sort pipeline above (per-read dedup sort inside minimizer_scan +
# flat compaction sort) spends most of its time sorting. The fused step does
# per-read dedup and compaction with ONE flat sort by packing the read id
# into the high bits of the sort key: every REPORTED minimizer value is
# < 2^(2k+8) (proof in ops/minimizer.py), so for 2k+8 + ceil(log2 R) <= 64
# the key (read_id << (2k+8)) | value sorts reads into contiguous groups and
# global adjacent-dedup == per-read distinct. An adjacent-run prededup along
# the position axis (the monotonic queue front repeats while a minimizer
# stays in-window) shrinks the live lanes ~5x before the sort so the
# compaction bucket still covers them; it is an optimisation only — the
# post-sort dedup is authoritative.


def fused_bits_ok(k: int, r: int) -> bool:
    """Can read ids be packed above the value bits in a 64-bit sort key?"""
    return (2 * k + 8) + max(r - 1, 1).bit_length() <= 64


def compact_default() -> bool:
    """Whether the fused step's per-row sort compaction is enabled
    (HULK_COMPACT_STEP=1/0 overrides; see stream_step_fused_body). Default
    ON: measured +27% grouped-step throughput at R=8192 and +19% at
    R=16384 on v5e (scripts/step_variants.py, round 5), bit-equality
    proven in tests and certified on hardware by the bench precheck."""
    import os

    return os.environ.get("HULK_COMPACT_STEP", "1") == "1"


# ---- 4-bit transfer packing -------------------------------------------------
#
# Base codes are 0..5, so two fit in one byte. Host->device bytes are the
# scarce resource through a remote-device tunnel (the transfer materialises
# synchronously inside the execution stream), so the host packs [R, L] codes
# into [R, L/2] nibbles and the step unpacks on device (two shifts + an
# interleave, trivially fused by XLA before the minimizer scan).


def pack_codes4(codes: np.ndarray) -> np.ndarray:
    """[.., L] u8 codes (0..5, pad 5) -> [.., ceil(L/2)] nibble-packed u8."""
    if codes.shape[-1] % 2:
        pad = [(0, 0)] * (codes.ndim - 1) + [(0, 1)]
        codes = np.pad(codes, pad, constant_values=5)
    return (codes[..., 0::2] | (codes[..., 1::2] << 4)).astype(np.uint8)


def unpack_codes4(packed):
    """Device-side inverse of pack_codes4 (jnp)."""
    lo = packed & jnp.uint8(0xF)
    hi = packed >> jnp.uint8(4)
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def unpack_codes2(codes2, mask8, lengths):
    """Device-side reconstruction of the exact padded codes from the v2
    transfer layout (hulk_pack_group_batch2): 2-bit codes [.., L/4] (position
    p in bits 2*(p%4)), N bitmask [.., L/8] (position p in bit 7-(p%8),
    np.packbits order), per-row lengths. Returns [.., L] u8 codes identical
    to the nibble path: 0..3 bases, 4 where the mask bit is set (N), 5 at and
    beyond each read's length."""
    shifts2 = np.arange(4, dtype=np.uint8) * np.uint8(2)
    c = ((codes2[..., None] >> shifts2) & jnp.uint8(3)).reshape(
        *codes2.shape[:-1], -1
    )
    shifts1 = np.uint8(7) - np.arange(8, dtype=np.uint8)
    m = ((mask8[..., None] >> shifts1) & jnp.uint8(1)).reshape(
        *mask8.shape[:-1], -1
    )
    c = jnp.where(m != 0, jnp.uint8(4), c)
    pos = np.arange(c.shape[-1], dtype=np.int32)
    return jnp.where(pos >= lengths[..., None], jnp.uint8(5), c)


@partial(jax.jit, static_argnames=("vbits", "pallas"), donate_argnums=(0,))
def bin_scatter_keys(hist, skeys, *, vbits: int, pallas: bool = False):
    """Bin a compacted slice of sorted (read_id << vbits | value) keys,
    dedup-adjacent, and scatter-add into the histogram."""
    nbins = hist.shape[0]
    live = skeys != _U64SENT
    neq = jnp.concatenate(
        [jnp.ones_like(skeys[:1], dtype=bool), skeys[1:] != skeys[:-1]]
    )
    mask = live & neq
    vals = skeys & np.uint64((1 << vbits) - 1)
    keys = jnp.where(mask, vals, np.uint64(0))
    bins = _jump_bins(keys, nbins, pallas)
    hist = hist.at[bins].add(mask.astype(jnp.int32))
    return hist


def compact_width(L: int, w: int) -> int:
    """Row-compaction slot count for the compact fused step: live lanes per
    row after the adjacent-run prededup are ~2L/(w+1) (the classic (w+1)/2
    minimizer density; measured 27.1 mean, 40 max over 41k random 150 bp
    rows at w=9), kept with 1.5x headroom + 16 and rounded to a 64-lane
    granule — a ~+7 sigma margin at the production shape (64 slots for
    L=160). Rows that overflow (adversarial constructions) divert the
    whole batch to the exact full-width path via lax.cond."""
    est = (3 * L) // (w + 1) + 16
    c = 64
    while c < est:
        c += 64
    return min(c, L)


def stream_step_fused_body(hist, count, codes, lengths, *, k: int, w: int,
                           bucket: int, pallas: bool = False,
                           compact: bool = False):
    """Unjitted body of sketch_stream_step_fused (shard_map reuse).

    compact=True inserts a per-row sort compaction before the global key
    sort: live lanes after the adjacent-run prededup are ~5x fewer than
    R*L, so each row's masked values row-sort (cheap L-wide segments) into
    the first compact_width(L, w) slots and only [R, C] lanes enter the
    global sort — same bit-exact histogram/count/value stream (the global
    sort of (rid << vbits | value) keys is order-insensitive to which
    equal-key lane survives, and rows that overflow C divert to the
    full-width branch)."""
    R, L = codes.shape
    vbits = 2 * k + 8
    if pallas:
        from hulk_tpu.ops.minimizer_pallas import (
            minimizer_window_pallas,
            pallas_window_ok,
        )

        pallas = pallas_window_ok(L)
    if pallas:
        wmin, report = minimizer_window_pallas(codes, lengths, k=k, w=w)
    else:
        wmin, report = minimizer_window(codes, lengths, k=k, w=w)
    # adjacent-run prededup along positions (optimisation only)
    prev_same = jnp.concatenate(
        [jnp.zeros_like(report[:, :1]),
         (wmin[:, 1:] == wmin[:, :-1]) & report[:, :-1]],
        axis=1,
    )
    m = report & ~prev_same
    # host constant (an eager device iota would be fetched back at lowering)
    rid = np.arange(R, dtype=np.uint64)[:, None] << np.uint64(vbits)
    m_live = jnp.sum(m)  # live lanes incl. surviving duplicates

    def finish(hist, flat):
        """Global key sort -> dedup-adjacent -> bin+scatter -> distinct
        values. flat: [N] sentinel-padded (rid << vbits | value) keys."""
        skeys = jnp.sort(flat)
        live = skeys != _U64SENT
        neq = jnp.concatenate(
            [jnp.ones_like(skeys[:1], dtype=bool), skeys[1:] != skeys[:-1]]
        )
        cnt = jnp.sum(live & neq)
        if bucket >= flat.shape[0]:
            hist = bin_scatter_keys(hist, skeys, vbits=vbits, pallas=pallas)
        else:
            hist = jax.lax.cond(
                m_live <= bucket,
                lambda h: bin_scatter_keys(
                    h, jax.lax.slice(skeys, (0,), (bucket,)), vbits=vbits,
                    pallas=pallas,
                ),
                lambda h: bin_scatter_keys(h, skeys, vbits=vbits, pallas=pallas),
                hist,
            )
        # distinct values for KHF/HMH feeds (idempotent updates; order-free).
        # KMV needs VALUE-sorted input — callers use bottom_k_values.
        vals = jnp.where(
            live & neq, skeys & np.uint64((1 << vbits) - 1), _U64SENT
        )
        return hist, cnt, vals

    C = compact_width(L, w) if compact else L
    if compact and C < L:
        # Per-row sort compaction: reported values fit positive i64
        # (< 2^(2k+8) <= 2^62 on this path), so an i64 row sort with a MAX
        # sentinel pushes each row's live lanes to the row front and only
        # [R, C] lanes enter the (much deeper) global sort. Rows that
        # overflow C divert the batch to the exact full-width branch; the
        # compact branch's value stream pads back to [R*L] so both
        # branches return one shape (the pad is cheap — the sorts are not).
        big = np.int64(0x7FFFFFFFFFFFFFFF)
        vi = jnp.where(m, wmin.astype(jnp.int64), big)
        rs = jnp.sort(vi, axis=1)
        kept = jax.lax.slice(rs, (0, 0), (R, C))
        overflow = jnp.any(jax.lax.slice(rs, (0, C), (R, C + 1)) != big)
        kept_u = kept.astype(jnp.uint64)
        skey_c = jnp.where(kept != big, rid | kept_u, _U64SENT).reshape(-1)
        skey_f = jnp.where(m, rid | wmin, _U64SENT).reshape(-1)

        def compact_branch(h):
            h, cnt, vals = finish(h, skey_c)
            pad = jnp.full((R * (L - C),), _U64SENT, dtype=jnp.uint64)
            return h, cnt, jnp.concatenate([vals, pad])

        hist, cnt, vals_flat = jax.lax.cond(
            overflow,
            lambda h: finish(h, skey_f),
            compact_branch,
            hist,
        )
    else:
        flat = jnp.where(m, rid | wmin, _U64SENT).reshape(-1)
        hist, cnt, vals_flat = finish(hist, flat)
    return hist, count + cnt.astype(count.dtype), vals_flat


def bottom_k_values(vals_flat, s: int):
    """Smallest s values of a SENT-padded distinct stream, ascending, SENT
    padded — the value-sorted prefix KMV needs, without sorting the full
    width. Valid while values fit in positive i64 (always when the fused
    path is selected: 2k+8 <= 64 - log2 R <= 62)."""
    big = np.int64(0x7FFFFFFFFFFFFFFF)
    vi = jnp.where(vals_flat == _U64SENT, big, vals_flat.astype(jnp.int64))
    nk = jax.lax.top_k(-vi, s)[0]  # largest of -v == smallest of v, asc in v
    asc = -nk
    return jnp.where(asc == big, _U64SENT, asc.astype(jnp.uint64))


@partial(jax.jit, static_argnames=("k", "w", "bucket", "pallas", "packed4",
                                   "compact"),
         donate_argnums=(0, 1))
def sketch_stream_step_fused(hist, count, codes, lengths, *, k: int, w: int,
                             bucket: int, pallas: bool = False,
                             packed4: bool = False, compact: bool = False):
    """Single-sort streaming step (see module comment). Bit-equal histogram
    and count to sketch_stream_step; the returned distinct-value stream is
    read-grouped rather than value-sorted. packed4=True takes nibble-packed
    codes ([R, L/2], see pack_codes4) and unpacks on device."""
    if packed4:
        codes = unpack_codes4(codes)
    return stream_step_fused_body(
        hist, count, codes, lengths, k=k, w=w, bucket=bucket, pallas=pallas,
        compact=compact,
    )


@partial(jax.jit, static_argnames=("k", "w", "bucket", "pallas", "packed4"),
         donate_argnums=(0, 1))
def sketch_stream_step(hist, count, codes, lengths, *, k: int, w: int, bucket: int,
                       pallas: bool = False, packed4: bool = False):
    """One fully-device streaming step with NO host synchronisation.

    The compacted path (device_step module docstring) needs the live-lane
    count to pick a slice width; reading it back costs a host round trip per
    step — through a remote-device tunnel that dwarfs the compute. Instead
    the bucket choice happens on device with lax.cond: the common branch bins
    the `bucket`-wide sorted prefix, the rare overflow branch bins full
    width. Both are exact; hist and the minimizer counter are donated
    carries, so a stream of steps is pure async dispatch.

    Returns (hist, count, svals) — svals (sorted, sentinel-padded) feeds the
    KMV/KHF/HMH device updates without recomputing the scan.
    """
    if packed4:
        codes = unpack_codes4(codes)
    return stream_step_body(
        hist, count, codes, lengths, k=k, w=w, bucket=bucket, pallas=pallas
    )


# ---- grouped single-transfer streaming -------------------------------------
#
# The remote-device tunnel charges ~80 ms of fixed latency per host->device
# transfer (measured; independent of payload) and compresses payloads to
# near-entropy on the wire (nibble-packed DNA moves ~3x faster than random
# bytes). The scarce resources are therefore TRANSFER COUNT and entropy, not
# payload bytes. This path ships one transfer group (G batches) as a SINGLE
# flat uint8 buffer — nibble-packed codes + uint16 lengths back-to-back — and
# consumes it with ONE jitted lax.scan over the G sub-batches, so a group
# costs one transfer + one dispatch instead of 2 transfers + G dispatches.


def build_group_buffer(codes_list, lengths_list) -> np.ndarray:
    """Host side: [G][R, L] u8 codes + [G][R] i32 lengths -> one flat u8
    buffer of nibble-packed codes followed by little-endian u16 lengths.
    Lengths always fit u16: reads at 65536+ are rejected upstream
    (stream/fastq.batch_reads_native max_read_len)."""
    packed = pack_codes4(np.stack(codes_list))
    lens = np.stack(lengths_list).astype("<u2")
    return np.concatenate([packed.reshape(-1), lens.view(np.uint8).reshape(-1)])


def _group_views(flatbuf, g: int, r: int, l: int):
    """Device side: slice the flat buffer back into packed codes + lengths."""
    l2 = (l + l % 2) // 2
    ncodes = g * r * l2
    codes = jax.lax.slice(flatbuf, (0,), (ncodes,)).reshape(g, r, l2)
    lraw = jax.lax.slice(flatbuf, (ncodes,), (ncodes + g * r * 2,))
    lengths = jax.lax.bitcast_convert_type(
        lraw.reshape(g, r, 2), jnp.uint16
    ).astype(jnp.int32)
    return codes, lengths


def _group_views2(flatbuf, g: int, r: int, l: int):
    """Device side for the v2 layout: 2-bit codes + N bitmask + lengths."""
    ncodes = g * r * (l // 4)
    nmask = g * r * (l // 8)
    codes2 = jax.lax.slice(flatbuf, (0,), (ncodes,)).reshape(g, r, l // 4)
    mask8 = jax.lax.slice(flatbuf, (ncodes,), (ncodes + nmask,)).reshape(
        g, r, l // 8
    )
    lraw = jax.lax.slice(
        flatbuf, (ncodes + nmask,), (ncodes + nmask + g * r * 2,)
    )
    lengths = jax.lax.bitcast_convert_type(
        lraw.reshape(g, r, 2), jnp.uint16
    ).astype(jnp.int32)
    return codes2, mask8, lengths


def group_scan_body(hist, count, kmv, khf, hmh, flatbuf, *, g: int,
                    r: int, l: int, k: int, w: int, bucket: int,
                    pallas: bool = False, use_kmv: bool = False,
                    use_khf: bool = False, use_hmh: bool = False,
                    hmh_pqr=None, packed2: bool = False,
                    compact: bool = False):
    """Unjitted group-scan over one flat transfer buffer (shared by the
    single-device jit below and the dp shard_map in parallel/mesh)."""
    from hulk_tpu.ops.device_sketches import hmh_update, khf_update, kmv_update

    if packed2:
        codes, mask8, lengths = _group_views2(flatbuf, g, r, l)
        xs_in = (codes, mask8, lengths)
    else:
        codes, lengths = _group_views(flatbuf, g, r, l)
        xs_in = (codes, lengths)

    def body(carry, xs):
        hist, count, kmv, khf, hmh = carry
        if packed2:
            codes_g, mask_g, len_g = xs
            codes_full = unpack_codes2(codes_g, mask_g, len_g)
        else:
            codes_g, len_g = xs
            codes_full = unpack_codes4(codes_g)
        hist, count, svals = stream_step_fused_body(
            hist, count, codes_full, len_g,
            k=k, w=w, bucket=bucket, pallas=pallas, compact=compact,
        )
        if use_kmv:
            kmv = kmv_update(kmv, bottom_k_values(svals, kmv.shape[0]))
        if use_khf:
            khf = khf_update(khf, svals)
        if use_hmh:
            p_, q_, r_ = hmh_pqr
            hmh = hmh_update(hmh, svals, p=p_, q=q_, r=r_)
        return (hist, count, kmv, khf, hmh), None

    (hist, count, kmv, khf, hmh), _ = jax.lax.scan(
        body, (hist, count, kmv, khf, hmh), xs_in
    )
    return hist, count, kmv, khf, hmh


@partial(
    jax.jit,
    static_argnames=(
        "g", "r", "l", "k", "w", "bucket", "pallas",
        "use_kmv", "use_khf", "use_hmh", "hmh_pqr", "packed2", "compact",
    ),
    donate_argnums=(0, 1, 2, 3, 4),
)
def sketch_stream_group_step(hist, count, kmv, khf, hmh, flatbuf, *, g: int,
                             r: int, l: int, k: int, w: int, bucket: int,
                             pallas: bool = False, use_kmv: bool = False,
                             use_khf: bool = False, use_hmh: bool = False,
                             hmh_pqr=None, packed2: bool = False,
                             compact: bool = False):
    """One transfer group of G sub-batches as a single dispatch.

    Carries (all donated): hist [nbins] i32, count [] i64, kmv/khf [s] u64,
    hmh [m] u64 (dummy [1] arrays when the corresponding flag is off).
    Bit-equal to G calls of sketch_stream_step_fused + the device sketch
    updates (tests/test_pipeline.py::test_group_step_matches_per_batch_steps).
    Requires fused_bits_ok(k, r).
    packed2 selects the v2 flat layout (2-bit codes + N bitmask; identical
    reconstructed codes, ~25% fewer transfer bytes)."""
    return group_scan_body(
        hist, count, kmv, khf, hmh, flatbuf, g=g, r=r, l=l, k=k, w=w,
        bucket=bucket, pallas=pallas, use_kmv=use_kmv, use_khf=use_khf,
        use_hmh=use_hmh, hmh_pqr=hmh_pqr, packed2=packed2, compact=compact,
    )


# The device-resident flush (CMS + CWS scan over a dense histogram) lives in
# parallel/mesh.sharded_flush_step — it is the single implementation, usable
# on a 1-device mesh for the unsharded case.
