"""Pallas TPU kernel for the minimizer window scan — the framework's hottest
op, fused into one VMEM pass.

Computes exactly what ops/minimizer.minimizer_window computes (reference
semantics: src/minimizer/minimizer.go:96-204, all quirks preserved — N bases
shifted in as c=4, unmasked reverse k-mer with the >>2 tail term, symmetric
skip, hash<<8|sign-extended-span packing, window minimum, report only at
valid positions), but with all 64-bit values hand-split into u32 pairs:

  * every shift in the rolling k-mer construction and in minimap2's hash64
    is a COMPILE-TIME constant, so each u64 op is 2-4 native VPU u32 ops
    (XLA's generic u64 emulation pays more per op);
  * the whole chain — encode windows, both rolling k-mers, canonical select,
    hash64, span packing, w-way window minimum, masks — runs on VMEM-resident
    blocks with no HBM intermediates between fused groups;
  * shifted views along the position axis use pltpu.roll + column masks
    (left-pad semantics identical to the XLA closed-form OR).

Constraints: L (the padded read length) must be a multiple of 128 (the
production length buckets all are); callers fall back to the XLA path
otherwise. Bit-equality with minimizer_window is tested in interpret mode on
CPU and compiled on TPU (tests/test_minimizer_pallas.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import hulk_tpu._jax_config  # noqa: F401

U32 = jnp.uint32
I32 = jnp.int32


def _c(x):
    return jnp.uint32(x)


def _i(x):
    return jnp.int32(x)


# ---- u32-pair arithmetic (all shift amounts are python ints) ---------------

def _pshl(h, l, s: int):
    if s == 0:
        return h, l
    if s < 32:
        return (h << _c(s)) | (l >> _c(32 - s)), l << _c(s)
    if s == 32:
        return l, l ^ l
    return l << _c(s - 32), l ^ l


def _pshr(h, l, s: int):
    if s == 0:
        return h, l
    if s < 32:
        return h >> _c(s), (l >> _c(s)) | (h << _c(32 - s))
    if s == 32:
        return h ^ h, h
    return h ^ h, h >> _c(s - 32)


def _padd(ah, al, bh, bl):
    l = al + bl
    return ah + bh + (l < al).astype(U32), l


def _plt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _pmin(ah, al, bh, bl):
    sel = _plt(ah, al, bh, bl)
    return jnp.where(sel, ah, bh), jnp.where(sel, al, bl)


def _hash64_pair(h, l, mh: int, ml: int):
    """minimap2 hash64 on a u32 pair, masked to 2k bits (mh, ml)."""
    MH, ML = _c(mh), _c(ml)
    th, tl = _pshl(h, l, 21)
    h, l = _padd(~h, ~l, th, tl)
    h, l = h & MH, l & ML
    th, tl = _pshr(h, l, 24)
    h, l = h ^ th, l ^ tl
    ah, al = _pshl(h, l, 3)
    bh, bl = _pshl(h, l, 8)
    h, l = _padd(*_padd(h, l, ah, al), bh, bl)
    h, l = h & MH, l & ML
    th, tl = _pshr(h, l, 14)
    h, l = h ^ th, l ^ tl
    ah, al = _pshl(h, l, 2)
    bh, bl = _pshl(h, l, 4)
    h, l = _padd(*_padd(h, l, ah, al), bh, bl)
    h, l = h & MH, l & ML
    th, tl = _pshr(h, l, 28)
    h, l = h ^ th, l ^ tl
    th, tl = _pshl(h, l, 31)
    h, l = _padd(h, l, th, tl)
    return h & MH, l & ML


def _or_shifted_small(h, l, v, s: int):
    """(h,l) |= v << s for v < 8 (a 3-bit base code), s in [0, 62]."""
    if s < 30:
        return h, l | (v << _c(s))
    if s < 32:
        return h | (v >> _c(32 - s)), l | (v << _c(s))
    return h | (v << _c(s - 32)), l


def _minimizer_kernel(k: int, w: int, L: int, codes_ref, len_ref,
                      wh_ref, wl_ref, rep_ref):
    c = codes_ref[:].astype(U32)  # [bm, L], values 0..5
    bm = c.shape[0]
    col = jax.lax.broadcasted_iota(I32, (bm, L), 1)
    length = len_ref[:]  # [bm, 1] i32
    in_read = col < length

    mask_int = (1 << (2 * k)) - 1
    mh_int, ml_int = (mask_int >> 32) & 0xFFFFFFFF, mask_int & 0xFFFFFFFF

    zero = c ^ c

    # forward k-mer: OR_{j=0..k-1} c[i-j] << 2j, left pad 0, masked to 2k bits
    fh, fl = zero, zero
    # reverse k-mer: OR_{j=0..k-1} (3^c[i-j]) << (2(k-1)-2j) + (3^c[i-k])>>2,
    # left pad comp 0 (= 3^3), NOT masked (u64 wrap is reference behaviour)
    rh, rl = zero, zero
    comp = c ^ _c(3)
    for j in range(k):
        cj = c if j == 0 else pltpu.roll(c, _i(j), axis=1)
        cj = jnp.where(col >= _i(j), cj, zero)
        fh, fl = _or_shifted_small(fh, fl, cj, 2 * j)
        pj = comp if j == 0 else pltpu.roll(comp, _i(j), axis=1)
        pj = jnp.where(col >= _i(j), pj, zero)
        rh, rl = _or_shifted_small(rh, rl, pj, 2 * (k - 1) - 2 * j)
    fh, fl = fh & _c(mh_int), fl & _c(ml_int)
    pk = pltpu.roll(comp, _i(k), axis=1)
    pk = jnp.where(col >= _i(k), pk, zero)
    rl = rl | (pk >> _c(2))  # j == k term: only an N (code 4 -> comp 7) survives

    # canonical strand + validity
    nonsym = ~((fh == rh) & (fl == rl))
    valid = nonsym & (col >= _i(k - 1)) & in_read
    cbig = _plt(rh, rl, fh, fl)  # rc < fwd -> take rc
    ch = jnp.where(cbig, rh, fh)
    cl = jnp.where(cbig, rl, fl)

    hh, hl = _hash64_pair(ch, cl, mh_int, ml_int)

    # x = hash<<8 | uint64(int32 span), span = min(i-w+2, k) sign-extended
    span = jnp.minimum(col - _i(w - 2), _i(k))
    sl = span.astype(U32)
    sh = jnp.where(span < _i(0), _c(0xFFFFFFFF), _c(0))
    xh, xl = _pshl(hh, hl, 8)
    xh, xl = xh | sh, xl | sl

    MAX = _c(0xFFFFFFFF)
    xh = jnp.where(valid, xh, MAX)
    xl = jnp.where(valid, xl, MAX)

    # sliding-window minimum over the trailing w positions, via prefix
    # doubling: log2(w) pair-mins instead of w-1 (min is associative, so
    # blocks covering 2^j trailing positions compose exactly)
    def rolled(h, l, d: int):
        dh = pltpu.roll(h, _i(d), axis=1)
        dl = pltpu.roll(l, _i(d), axis=1)
        edge = col < _i(d)
        return jnp.where(edge, MAX, dh), jnp.where(edge, MAX, dl)

    blk_h, blk_l = xh, xl
    blk_len = 1
    acc = None
    rem = w
    while True:
        if rem & 1:
            if acc is None:
                acc_h, acc_l = blk_h, blk_l
                acc = True
            else:
                sh2, sl2 = rolled(acc_h, acc_l, blk_len)
                acc_h, acc_l = _pmin(blk_h, blk_l, sh2, sl2)
        rem >>= 1
        if rem == 0:
            break
        sh2, sl2 = rolled(blk_h, blk_l, blk_len)
        blk_h, blk_l = _pmin(blk_h, blk_l, sh2, sl2)
        blk_len *= 2
    wh, wl = acc_h, acc_l

    report = valid & (col >= _i(w - 1))
    wh_ref[:] = wh
    wl_ref[:] = wl
    rep_ref[:] = report.astype(I32)


# rows*columns budget per VMEM block: the kernel holds ~30 live u32
# [bm, L] intermediates (measured: a [256, 1024] block allocates ~31 MB of
# scoped VMEM vs the 16 MB limit), so bm*L <= 2^16 keeps blocks under
# ~8 MB with margin. Above PALLAS_MAX_L even an 8-row block busts the
# budget — callers take the XLA window instead (pallas_window_ok).
_BLOCK_ELEMS = 1 << 16
PALLAS_MAX_L = 8192


def pallas_window_ok(l: int) -> bool:
    """Can the Mosaic window kernel run at this padded read length?"""
    return (l + (-l) % 128) <= PALLAS_MAX_L


def _auto_block_rows(L: int) -> int:
    return min(256, max(8, (_BLOCK_ELEMS // L) & ~7))


@partial(jax.jit, static_argnames=("k", "w", "block_rows", "interpret"))
def minimizer_window_pallas(codes, lengths, *, k: int, w: int,
                            block_rows: int | None = None,
                            interpret: bool = False):
    """Pallas form of minimizer_window. codes: [R, L] integer codes (any int
    dtype), lengths: [R] int32. Inputs are padded internally to the lane/
    sublane granule (columns with pad code 5 are outside every read; extra
    rows have length 0). block_rows=None auto-sizes the VMEM block to the
    read length (see _BLOCK_ELEMS). Returns (wmin [R, L] uint64,
    report [R, L] bool)."""
    R0, L0 = codes.shape
    if block_rows is None:
        block_rows = _auto_block_rows(L0 + (-L0) % 128)
    pad_r = (-R0) % block_rows
    pad_l = (-L0) % 128
    if pad_r or pad_l:
        codes = jnp.pad(codes, ((0, pad_r), (0, pad_l)), constant_values=5)
        lengths = jnp.pad(lengths, (0, pad_r))
    R, L = codes.shape
    ci = codes.astype(jnp.int32)
    len2d = lengths.astype(jnp.int32).reshape(R, 1)
    grid = R // block_rows
    imap = lambda i: (i, jnp.int32(0))  # noqa: E731
    wh, wl, rep = pl.pallas_call(
        partial(_minimizer_kernel, k, w, L),
        out_shape=(
            jax.ShapeDtypeStruct((R, L), U32),
            jax.ShapeDtypeStruct((R, L), U32),
            jax.ShapeDtypeStruct((R, L), I32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, L), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, L), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, L), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, L), imap, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ci, len2d)
    if pad_r or pad_l:
        wh, wl, rep = wh[:R0, :L0], wl[:R0, :L0], rep[:R0, :L0]
    wmin = (wh.astype(jnp.uint64) << np.uint64(32)) | wl.astype(jnp.uint64)
    return wmin, rep.astype(bool)
