"""Fully-jitted device compute: the streaming sketch step and the fast flush.

The streaming step (minimizers -> jump binning -> histogram scatter) is
integer/f64-exact and bit-matches the host path on any backend. The device
flush (CMS + CWS update as a lax.scan) is the throughput path for huge bin
counts; it uses XLA's exp/log, so its weights can differ from Go's by ~1 ULP
(the host flush in sketch/histosketch.py remains the exactness oracle; bin
choices agree except at exact FP decision boundaries).

Designed so the histogram is a donated carry: steps accumulate on device with
no host roundtrips, and data-parallel shards merge with psum (exact — counts
are integer-valued f64).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import hulk_tpu._jax_config  # noqa: F401
from hulk_tpu.hashes.jumphash_exact import jump_hash_exact_jnp
from hulk_tpu.ops.minimizer import minimizer_scan


@partial(jax.jit, static_argnames=("k", "w"), donate_argnums=(0,))
def sketch_accumulate_step(hist, codes, lengths, *, k: int, w: int):
    """One streaming step: histogram += binned minimizers of this batch.

    hist: [nbins] int32 (donated; counts are exact integers — the host
    converts to the reference's float64 spectrum losslessly). Uses the
    integer-emulated jump hash so binning is bit-exact on TPU, where native
    f64 divide is not correctly rounded. Returns (hist, n_minimizers).
    """
    nbins = hist.shape[0]
    vals, mask = minimizer_scan(codes, lengths, k=k, w=w)
    bins = jump_hash_exact_jnp(vals, nbins)
    contrib = mask.astype(jnp.int32)
    hist = hist.at[bins.reshape(-1)].add(contrib.reshape(-1))
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
# Safe for k <= 27 (values < 2^63, so a real value can never equal the
# sentinel); the pipeline falls back to the full-width path otherwise.

_U64SENT = jnp.uint64(0xFFFFFFFFFFFFFFFF)


@partial(jax.jit, static_argnames=("k", "w"))
def minimizer_sorted_flat(codes, lengths, *, k: int, w: int):
    """-> (sorted flat values with U64MAX sentinels, live count)."""
    vals, mask = minimizer_scan(codes, lengths, k=k, w=w)
    flat = jnp.where(mask, vals, _U64SENT).reshape(-1)
    return jnp.sort(flat), jnp.sum(mask)


@partial(jax.jit, static_argnames=(), donate_argnums=(0,))
def bin_scatter_slice(hist, svals):
    """Bin a compacted slice and scatter-add into the histogram.

    Dead sentinel lanes are remapped to key 0, which converges in one jump
    iteration and scatters with weight 0.
    """
    nbins = hist.shape[0]
    live = svals != _U64SENT
    keys = jnp.where(live, svals, jnp.uint64(0))
    bins = jump_hash_exact_jnp(keys, nbins)
    hist = hist.at[bins].add(live.astype(jnp.int32))
    return hist


def live_bucket(count: int, total: int, r: int) -> int:
    """Smallest padded slice size covering `count` live values."""
    b = max(16 * r, 1024)
    while b < count:
        b *= 2
    return min(b, total)


def make_flush_fn(r_t, c_t, b_t, exp_r_t, decay_weight: float, apply_drift: bool):
    """Build a jitted device flush over a dense histogram.

    Tables are [s, nbins] device arrays (can be sharded over s across a model
    axis). The scan walks bins in ascending order — matching the reference's
    dump order — updating CMS state and the (sketch, weights) carry; zero
    bins are masked no-ops so the scan has a static trip count.
    """
    from hulk_tpu.sketch.countmin import cms_shape

    depth, width = cms_shape()
    s = r_t.shape[0]

    def flush(hist, sketch, weights):
        nbins = hist.shape[0]
        bin_ids = jnp.arange(nbins, dtype=jnp.uint64)
        # CMS row positions for every bin (vectorised; exact integer+f64 math)
        row_bins = jnp.stack(
            [jump_hash_jnp(bin_ids + jnp.uint64(d) * bin_ids, width) for d in range(depth)]
        )  # [depth, nbins]

        def body(carry, xs):
            cms, sketch, weights = carry
            freq, rb, jbin = xs
            live = freq != 0.0
            cms_in = jnp.where(live & apply_drift, cms * decay_weight, cms)
            rows = jnp.arange(depth)
            updated = cms_in.at[rows, rb].add(jnp.where(live, freq, 0.0))
            esti = updated[rows, rb].min()
            yka = jnp.exp(jnp.log(esti) - b_t[:, jbin])
            aka = c_t[:, jbin] / (yka * exp_r_t[:, jbin])
            cur = jnp.where(apply_drift, weights / decay_weight, weights)
            better = live & (aka < cur)
            sketch = jnp.where(better, jbin, sketch)
            weights = jnp.where(better, aka, weights)
            return (updated, sketch, weights), None

        cms0 = jnp.zeros((depth, width), dtype=jnp.float64)
        jbins = jnp.arange(nbins, dtype=jnp.int64)
        (cms, sketch, weights), _ = jax.lax.scan(
            body, (cms0, sketch, weights), (hist, row_bins.T, jbins)
        )
        return sketch, weights

    return jax.jit(flush)
