"""Vectorised minimizer extraction — the framework's hottest op.

Reimplements the semantics of the reference's rolling scan
(src/minimizer/minimizer.go:96-204) as a data-parallel computation over a
[reads, positions] batch, suitable for the TPU VPU: the sequential rolling
k-mer update is replaced by a closed-form windowed OR (exact because Go's
update is `(x<<2)|c` — an OR — so composition distributes), the monotonic
queue by a sliding-window minimum, and the per-read set by sort+unique.

Reference quirks reproduced bit-for-bit:
  * ambiguous bases are NOT skipped; c=4 is shifted into both rolling k-mers,
    deterministically corrupting the packing (minimizer.go:115-122,134-137)
  * symmetric k-mers (fwd==rc) are skipped entirely (145-147)
  * X = hash64(canonical)<<8 | uint64(int32(span)), span = min(i-w+2, k) —
    including sign-extension when k<w makes the span negative (127-131,156-158)
  * a read contributes each distinct minimizer value once (84,188-198); the
    output is the per-read distinct set (sorted; order is irrelevant
    downstream, as it was for Go's unordered set)
  * reads shorter than w+k-1 are an error in the reference (59-76); here they
    simply produce no minimizers and are reported via the short_mask so the
    caller can replicate the reference's fatal behaviour.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import hulk_tpu._jax_config  # noqa: F401
from hulk_tpu.hashes.hash64 import hash64_jnp

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)  # np scalar: a jnp scalar would live on device and cost a D2H sync at every lowering


@partial(jax.jit, static_argnames=("k", "w", "cont"))
def minimizer_window(codes, lengths, *, k: int, w: int, cont: bool = False):
    """Window minima + report mask (the pre-dedup minimizer stream).

    Args:
      codes: [R, L] integer array of base codes (0-4; >=5 treated as pad).
      lengths: [R] int32 read lengths.
      k, w: k-mer and window sizes (static; 0<k<32, 0<w<257).
      cont: rows are CONTINUATION blocks of longer reads (ops/longread.py),
            overlapping the previous block by w+k-1 bases. Exactness at the
            seam: the reference's rc rolling k-mer carries N-corruption from
            base i-k (the unmasked `(3^c)<<bitshift` reaches bit 2k and
            decays over k right-shifts), so an entry at local position q is
            bit-identical to the in-context entry iff q >= k; a window
            reported at local p >= w+k-1 contains only entries q >= k, and
            every such entry's span is saturated (global position >= k+w-2,
            so min(pos-(w-2), k) == k — blocks start at global offsets
            >= block-halo >= w+k-1). Hence for cont rows: span == k
            everywhere and reporting starts at local position w+k-1; block
            b's reported window set [b*(S-H)+H, b*(S-H)+S-1] (H = w+k-1)
            tiles the read's window positions exactly.

    Returns:
      wmin:   [R, L] uint64 window minimum ending at each position.
      report: [R, L] bool, True where the reference reports the queue front
              (valid current k-mer, full window). The distinct-per-read set
              of reported wmin values is the reference's minimizer set.
    """
    R, L = codes.shape
    c = codes.astype(jnp.uint64)
    mask_int = (1 << (2 * k)) - 1
    mask = np.uint64(mask_int)
    # NB: constants in this function are numpy (host) or derived from tracers.
    # An eager jnp constant inside a traced function materialises on the
    # device and is fetched back during lowering — through a remote-device
    # tunnel that one fetch can cost longer than the XLA compile itself.
    pos = np.arange(L, dtype=np.int64)[None, :]  # [1, L]
    in_read = pos < lengths[:, None].astype(jnp.int64)

    # forward k-mer: OR_{j=0..k-1} c[i-j] << 2j  (left-pad contributes 0)
    cf = jnp.pad(c, ((0, 0), (k - 1, 0)))
    fwd = jnp.zeros_like(c)
    for j in range(k):
        fwd = fwd | (cf[:, k - 1 - j : k - 1 - j + L] << (2 * j))
    fwd = fwd & mask

    # reverse k-mer: OR_{j=0..k} (3^c[i-j]) << (2(k-1)-2j), j=k term is >>2;
    # left-pad with 3 so 3^pad == 0. No mask in the reference (uint64 carry
    # of N-bits is part of the replicated behaviour).
    comp = np.uint64(3) ^ jnp.pad(c, ((0, 0), (k, 0)), constant_values=3)
    rc = jnp.zeros_like(c)
    for j in range(k):
        rc = rc | (comp[:, k - j : k - j + L] << (2 * (k - 1) - 2 * j))
    rc = rc | (comp[:, 0:L] >> 2)  # j == k: only an N (code 4) survives

    # span = min(i-w+2, k), then Go converts int32 span -> uint64 (sign-extends)
    if cont:
        # continuation blocks: every position's global span is saturated
        span_u = np.full((1, L), k, dtype=np.uint64)
    else:
        span = np.minimum(pos - (w - 2), k).astype(np.int64)
        span_u = span.astype(np.uint64)  # host constant, [1, L]; broadcasts below

    nonsym = fwd != rc
    valid = nonsym & (pos >= (k - 1)) & in_read

    canonical = jnp.where(fwd > rc, rc, fwd)
    hashed = hash64_jnp(canonical, mask_int)
    x = (hashed << 8) | span_u
    xm = jnp.where(valid, x, _U64MAX)

    # sliding-window minimum over the trailing w positions, via prefix
    # doubling (log2(w) mins instead of w-1; min is associative so blocks
    # covering 2^j trailing positions compose exactly)
    pxm = jnp.pad(xm, ((0, 0), (w - 1, 0)), constant_values=np.uint64(0xFFFFFFFFFFFFFFFF))

    blk = pxm  # covers 1 trailing position
    blk_len = 1
    acc = None
    rem = w
    while True:
        if rem & 1:
            if acc is None:
                acc = blk
            else:
                acc = jnp.minimum(blk[:, : acc.shape[1] - blk_len], acc[:, blk_len:])
        rem >>= 1
        if rem == 0:
            break
        blk = jnp.minimum(blk[:, blk_len:], blk[:, : blk.shape[1] - blk_len])
        blk_len *= 2
    wmin = acc  # covers w -> exactly L columns

    report = valid & (pos >= ((w + k - 1) if cont else (w - 1)))
    return wmin, report


@partial(jax.jit, static_argnames=("k", "w", "pallas"))
def minimizer_scan(codes, lengths, *, k: int, w: int, pallas: bool = False):
    """Per-read distinct minimizer values.

    pallas=True runs the window scan as the Pallas TPU kernel (bit-equal;
    keeps the hot kernel on the Mosaic path even when the caller cannot use
    the fused single-sort step, e.g. k >= 25 at R=8192 where read ids no
    longer pack above the value bits).

    Returns:
      values: [R, L] uint64, sorted ascending per read.
      mask:   [R, L] bool, True for each distinct minimizer value.

    U64MAX is a safe dead-lane sentinel for ALL (k, w): the reference only
    inserts the queue front at positions where the current k-mer was pushed
    (the i<k-1 and fwd==rc branches `continue` past the insert,
    minimizer.go:139-147, 185-198), and at such a position i >= w-1 the
    current entry has span = min(i-w+2, k) in [1, 31], so its low byte !=
    0xFF and front <= x_i < U64MAX. In fact every REPORTED value is
    < 2^(2k+8): the window includes the current position's entry, which is
    below that bound. The negative-span all-ones values that exist for k < w
    (span=-1 at i=w-3 gives x == U64MAX exactly) are only ever pushed, never
    reported. (Differentially verified against the literal oracle over k<w,
    symmetric-heavy and k=28..31 constructions in tests/test_minimizer.py.)
    """
    R, L = codes.shape
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
    # per-read distinct values: sort reported values, keep first of each run
    vals = jnp.where(report, wmin, _U64MAX)
    svals = jnp.sort(vals, axis=1)
    neq_prev = jnp.concatenate(
        [jnp.ones_like(svals[:, :1], dtype=bool), svals[:, 1:] != svals[:, :-1]],
        axis=1,
    )
    out_mask = neq_prev & (svals != _U64MAX)
    return svals, out_mask


def short_read_mask(lengths: np.ndarray, k: int, w: int) -> np.ndarray:
    """Reads the reference would reject as fatal errors (len < w+k-1 or 0)."""
    return (lengths < (w + k - 1)) | (lengths < 1)
