"""Pallas TPU kernel for the exact Lamping-Veach jump hash.

Replaces the XLA while-loop in hashes/jumphash_exact.py on the hot streaming
path (reference dep dgryski/go-jump, used at src/kmerspectrum/kmerspectrum.go:70).
Two wins over the XLA lowering:

  1. All 64-bit arithmetic is hand-written as u32 pairs (16-bit-split
     multiplies, explicit carries). XLA's emulated u64/i64 ops measured
     ~0.12 ms/iteration over 262k lanes; the u32 forms map directly onto
     native VPU int ops.
  2. Per-block early exit: the grid splits the lanes into independent
     VMEM-resident blocks, each running its own while-loop. The XLA loop
     pays the WORST lane of the whole batch (~34 iterations at 262k lanes
     vs ~12 mean); a block only pays its own worst (~24-27).

The computation is the same bit-exact IEEE-f64 emulation documented in
jumphash_exact.py: q = RN(2^31/d) via an exact 53-bit mantissa
m = RNE(2^83/dn) (two ~27-bit long-division digits, f32-reciprocal
estimated + integer corrected), p = RN((b+1) * q) (85-bit product rounded
half-even to 53 bits), j = trunc(p). d = 2^31 is special-cased (q == 1.0).

Lanes whose j has converged (j >= n) hold their state; the block exits when
all its lanes converge. j is stored clamped to 2^31-1 (its exact value is
only ever consumed when j < n < 2^31).

NOTE: every scalar in kernel code is explicitly dtyped (_c/_i/_f) — weak-typed
Python literals send this JAX version's Mosaic lowering into infinite
recursion during canonicalization.
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

_LCG = 2862933555777941757
_LCG_HI = (_LCG >> 32) & 0xFFFFFFFF  # 0x27BB2EE6
_LCG_LO = _LCG & 0xFFFFFFFF  # 0x87B0B0FD

_MASK16 = 0xFFFF


def _c(x):
    return jnp.uint32(x)


def _i(x):
    return jnp.int32(x)


def _f(x):
    return jnp.float32(x)


def _umul32(a, b):
    """Full 32x32 -> 64 unsigned multiply as (hi, lo) u32 pair.

    16-bit-split schoolbook: every partial product fits u32 exactly.
    """
    a0 = a & _c(_MASK16)
    a1 = a >> _c(16)
    b0 = b & _c(_MASK16)
    b1 = b >> _c(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _c(16)) + (p01 & _c(_MASK16)) + (p10 & _c(_MASK16))
    lo = (mid << _c(16)) | (p00 & _c(_MASK16))
    hi = p11 + (p01 >> _c(16)) + (p10 >> _c(16)) + (mid >> _c(16))
    return hi, lo


def _lcg_step(kh, kl):
    """(kh,kl) = (kh,kl) * LCG + 1 (mod 2^64)."""
    hi0, lo0 = _umul32(kl, _c(_LCG_LO))
    hi = hi0 + kl * _c(_LCG_HI) + kh * _c(_LCG_LO)
    lo = lo0 + _c(1)
    hi = hi + (lo == _c(0)).astype(U32)
    return hi, lo


def _bitlen_i32pos(x_u32):
    """Bit length of a value in [0, 2^31): f32-exponent estimate corrected
    by one exact shift check (mirrors jumphash_exact._bitlen32)."""
    xf = x_u32.astype(I32).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, U32)
    n = ((bits >> _c(23)) & _c(0xFF)).astype(I32) - _i(126)
    r = x_u32 >> jnp.clip(n - _i(1), _i(0), _i(31)).astype(U32)
    n = n - (r == _c(0)).astype(I32) + (r > _c(1)).astype(I32)
    return jnp.where(x_u32 == _c(0), _i(0), n)


def _bitlen_u32(x):
    """Bit length of any u32 (0 -> 0)."""
    top = (x >> _c(31)) != _c(0)
    return jnp.where(top, _i(32), _bitlen_i32pos(x & _c(0x7FFFFFFF)))


def _u32_to_f32(x):
    """u32 -> f32 (estimate-grade: drops the low bit for values >= 2^31;
    exact integer corrections downstream absorb the slop)."""
    return (x >> _c(1)).astype(I32).astype(jnp.float32) * _f(2.0) + (
        x & _c(1)
    ).astype(I32).astype(jnp.float32)


def _pair_sub(ah, al, bh, bl):
    """(ah,al) - (bh,bl), two's-complement pair; hi returned as i32."""
    rl = al - bl
    borrow = (al < bl).astype(U32)
    rh = ah.astype(I32) - bh.astype(I32) - borrow.astype(I32)
    return rh, rl


def _digit(nh, nl, dn, rcp, rounds: int):
    """Exact (floor(num/dn), num mod dn) for num = nh*2^32+nl < 2^57,
    dn in [2^30, 2^31).

    f32-reciprocal estimate + one multiplicative refinement + `rounds`
    +-1 correction steps (error budget documented in jumphash_exact._digit).
    Returns (q as i32 <= 2^27, remainder as u32 < dn). The first digit hits
    2^27 exactly when dn == 2^30 (d a power of two); downstream handles it
    (d1u<<26 wraps, the carry is recovered via d1u>>6).
    """
    num_f = nh.astype(I32).astype(jnp.float32) * _f(4294967296.0) + _u32_to_f32(nl)
    e = (num_f * rcp).astype(I32)
    ph, plo = _umul32(e.astype(U32), dn)
    rh, rl = _pair_sub(nh, nl, ph, plo)
    rf = rh.astype(jnp.float32) * _f(4294967296.0) + _u32_to_f32(rl)
    c = (rf * rcp).astype(I32)
    q = e + c
    # r -= c * dn  (|c| small signed)
    ca = jnp.abs(c).astype(U32)
    ch, cl = _umul32(ca, dn)
    neg = c < _i(0)
    # conditional pair add/sub of (ch, cl)
    rl_sub = rl - cl
    rh_sub = rh - ch.astype(I32) - (rl < cl).astype(I32)
    rl_add = rl + cl
    rh_add = rh + ch.astype(I32) + (rl_add < rl).astype(I32)
    rh = jnp.where(neg, rh_add, rh_sub)
    rl = jnp.where(neg, rl_add, rl_sub)
    for _ in range(rounds):
        under = rh < _i(0)
        over = jnp.logical_not(under) & ((rh > _i(0)) | (rl >= dn))
        q = q + over.astype(I32) - under.astype(I32)
        # under: r += dn ; over: r -= dn
        rl_u = rl + dn
        rh_u = rh + (rl_u < rl).astype(I32)
        rl_o = rl - dn
        rh_o = rh - (rl < dn).astype(I32)
        rh = jnp.where(under, rh_u, jnp.where(over, rh_o, rh))
        rl = jnp.where(under, rl_u, jnp.where(over, rl_o, rl))
    return q, rl


def _jump_block_body(n: int, state):
    kh, kl, b, j, _ = state
    active = j < _i(n)
    b = jnp.where(active, j, b)
    nkh, nkl = _lcg_step(kh, kl)
    kh = jnp.where(active, nkh, kh)
    kl = jnp.where(active, nkl, kl)

    d = (kh >> _c(1)) + _c(1)  # (key >> 33) + 1, in [1, 2^31]
    is_pow31 = d == _c(0x80000000)
    dd = jnp.where(is_pow31, _c(1), d)  # [1, 2^31)

    t = _bitlen_i32pos(dd) - _i(1)  # 0..30
    dn = dd << jnp.clip(_i(30) - t, _i(0), _i(30)).astype(U32)  # [2^30, 2^31)
    rcp = _f(1.0) / dn.astype(I32).astype(jnp.float32)

    # m = RNE(2^83/dn) via two exact long-division digits
    nh1 = jnp.full(dd.shape, 1 << 25, dtype=U32)  # 2^57 = (1<<25, 0)
    nl1 = jnp.zeros_like(dd)
    d1, r1 = _digit(nh1, nl1, dn, rcp, 3)
    d2, r2 = _digit(r1 >> _c(6), r1 << _c(26), dn, rcp, 3)
    d1u = d1.astype(U32)
    ml0 = d1u << _c(26)
    ml = ml0 + d2.astype(U32)
    mh = (d1u >> _c(6)) + (ml < ml0).astype(U32)
    # round half to even
    r2x2 = r2 << _c(1)
    up = (r2x2 > dn) | ((r2x2 == dn) & ((ml & _c(1)) == _c(1)))
    ml = ml + up.astype(U32)
    mh = mh + (up & (ml == _c(0))).astype(U32)

    # p = B * m, 85-bit as 3 words
    B = (b + _i(1)).astype(U32)
    t0h, t0l = _umul32(B, ml)
    t1h, t1l = _umul32(B, mh)
    p0 = t0l
    p1 = t0h + t1l
    p2 = t1h + (p1 < t0h).astype(U32)

    nbits = jnp.where(
        p2 != _c(0),
        _i(64) + _bitlen_i32pos(p2),
        jnp.where(p1 != _c(0), _i(32) + _bitlen_u32(p1), _bitlen_u32(p0)),
    )
    shift = jnp.maximum(nbits - _i(53), _i(0))  # 0..31
    sh = shift.astype(U32)
    inv = (_c(32) - sh) & _c(31)
    shifted_lo = (p0 >> sh) | (p1 << inv)
    shifted_hi = (p1 >> sh) | (p2 << inv)
    main_lo = jnp.where(sh == _c(0), p0, shifted_lo)
    main_hi = jnp.where(sh == _c(0), p1, shifted_hi)
    g_pos = jnp.where(sh == _c(0), _c(0), sh - _c(1))
    guard = jnp.where(sh == _c(0), _c(0), (p0 >> g_pos) & _c(1))
    stmask = jnp.where(sh >= _c(2), (_c(1) << g_pos) - _c(1), _c(0))
    sticky = (p0 & stmask) != _c(0)
    roundup = (guard == _c(1)) & (sticky | ((main_lo & _c(1)) == _c(1)))
    main_lo = main_lo + roundup.astype(U32)
    main_hi = main_hi + (roundup & (main_lo == _c(0))).astype(U32)

    # j = trunc(main * 2^exp2), exp2 in [-52, 9]
    exp2 = shift + (_i(30) - t) - _i(52)
    # positive: s in [0, 9]
    sp = jnp.clip(exp2, _i(0), _i(31)).astype(U32)
    invp = (_c(32) - sp) & _c(31)
    jl_pos = main_lo << sp
    jh_pos = jnp.where(sp == _c(0), main_hi, (main_hi << sp) | (main_lo >> invp))
    # negative: s in [1, 52]
    sn = jnp.clip(-exp2, _i(0), _i(63)).astype(U32)
    sn_lo = sn & _c(31)
    invn = (_c(32) - sn_lo) & _c(31)
    small = sn < _c(32)
    jl_neg = jnp.where(
        small,
        jnp.where(sn_lo == _c(0), main_lo, (main_lo >> sn_lo) | (main_hi << invn)),
        main_hi >> sn_lo,
    )
    jh_neg = jnp.where(small, main_hi >> sn_lo, _c(0))
    pos = exp2 >= _i(0)
    jl = jnp.where(pos, jl_pos, jl_neg)
    jh = jnp.where(pos, jh_pos, jh_neg)

    jbig = (jh != _c(0)) | (jl >= _c(0x80000000))
    jj = jnp.where(jbig, _i(0x7FFFFFFF), jl.astype(I32))
    jj = jnp.where(is_pow31, b + _i(1), jj)
    j = jnp.where(active, jj, j)
    # (1,1) running min of j for the loop condition: the while cond itself
    # cannot evaluate varying-vector reductions (Mosaic relayout limits), so
    # the body computes it and the cond only reads a scalar
    mj = jnp.min(jnp.min(j, axis=0, keepdims=True), axis=1, keepdims=True)
    return kh, kl, b, j, mj


def _jump_kernel(n: int, kh_ref, kl_ref, out_ref):
    kh = kh_ref[:]
    kl = kl_ref[:]
    # initial b/j must carry a TILED layout: the while body produces tiled
    # results, and Mosaic cannot relayout varying data back to a replicated
    # carry. Splat constants — and anything Mosaic constant-folds to one,
    # including kh^kh — get the replicated layout, so derive zeros from an
    # iota's sign bit (no fold rule reaches it). A single-axis iota is still
    # replicated along the other axis ({*,0}/{0,*}); summing both gives the
    # fully-tiled {0,0} layout the body produces.
    it = jax.lax.broadcasted_iota(I32, kh.shape, 0) + jax.lax.broadcasted_iota(
        I32, kh.shape, 1
    )
    zeros = it >> _i(31)
    mj0 = jnp.min(jnp.min(zeros, axis=0, keepdims=True), axis=1, keepdims=True)
    state = (kh, kl, zeros - _i(1), zeros, mj0)

    def cond(state):
        return state[4][0, 0] < _i(n)

    _, _, b, _, _ = jax.lax.while_loop(cond, partial(_jump_block_body, n), state)
    out_ref[:] = b


@partial(jax.jit, static_argnames=("num_buckets", "block_rows", "interpret"))
def jump_hash_pallas(keys, num_buckets: int, block_rows: int = 64, interpret: bool = False):
    """Bit-exact Go jump hash, Pallas TPU kernel. keys: [N] uint64, N a
    multiple of 128*block_rows (pad with zero keys — they converge to bin 0
    in one iteration). Returns int32 bins [N]."""
    n = keys.shape[0]
    lanes = 128 * block_rows
    if n % lanes != 0:
        raise ValueError(
            f"jump_hash_pallas: key count {n} must be a multiple of "
            f"128*block_rows={lanes}; pad with zero keys (they bin to 0 in "
            f"one iteration and can be masked out by the caller)"
        )
    kh = (keys >> np.uint64(32)).astype(U32).reshape(n // 128, 128)
    kl = keys.astype(U32).reshape(n // 128, 128)
    grid = n // lanes
    # index map returns explicitly-typed ints: under jax_enable_x64 a literal
    # 0 becomes i64 and Mosaic fails to legalize the (i32, i64) index tuple
    imap = lambda i: (i, jnp.int32(0))  # noqa: E731
    out = pl.pallas_call(
        partial(_jump_kernel, num_buckets),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), I32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, 128), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 128), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 128), imap, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(kh, kl)
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("num_buckets", "block_rows", "interpret"))
def jump_hash_tpu(keys, num_buckets: int, block_rows: int = 64, interpret: bool = False):
    """jump_hash_pallas for any key count: pads with zero keys (bin 0 in one
    iteration) to the 128*block_rows lane granule and slices the result."""
    n = keys.shape[0]
    lanes = 128 * block_rows
    pad = (-n) % lanes
    if pad:
        keys = jnp.pad(keys, (0, pad))
    out = jump_hash_pallas(keys, num_buckets, block_rows, interpret)
    return out[:n] if pad else out
