"""Jump hash with integer-emulated IEEE float64 arithmetic — for TPU.

TPU f64 division/multiplication are not correctly rounded (measured up to
~200 ULP here), so the float path (jumphash.py) produces ~1% wrong buckets on
TPU. This module computes the exact same buckets as Go's

    j = int64(float64(b+1) * (float64(1<<31) / float64((key>>33)+1)))

(reference dep dgryski/go-jump, used at src/kmerspectrum/kmerspectrum.go:70
and src/countmin/countmin.go:125) by emulating both IEEE round-to-nearest-even
roundings with pure integer ops:

  1. q = RN(2^31/d): let t = floor(log2 d) and dn = d << (30-t) in
     [2^30, 2^31). Then the 53-bit mantissa is m = RNE(2^(t+53)/d)
     = RNE(2^83/dn) — a CONSTANT numerator — computed as two exact ~27-bit
     quotient digits of a schoolbook division, each estimated with an f32
     reciprocal (native, fast) and corrected with exact integer
     multiply-subtract rounds; q's exponent is 30-t. d = 2^31 (the only
     t=31 case) makes q exactly 1.0 and is special-cased.
  2. p = RN(B * q), B = b+1 <= 2^31: the exact 85-bit product B*m is formed
     as a (hi, lo) pair and rounded half-even to 53 significant bits.
  3. j = trunc(p): mantissa shifted by the binary exponent.

TPU lowering constraints (measured):
  * u64 VARIABLE shifts and f64 arithmetic lower to very slow emulation, so
    all variable shifts and bit-length computations run on native u32 halves,
    and no f64 op is used anywhere;
  * u32<->f32 conversions and f32 divides are native and fast; their rounding
    slop only affects quotient ESTIMATES, which exact integer correction
    rounds then fix (the correction budget, +-3, is far beyond the worst
    measured estimator error).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import hulk_tpu._jax_config  # noqa: F401

_LCG = 2862933555777941757
U64 = jnp.uint64
U32 = jnp.uint32


def _u(x):
    # np scalar: jnp scalars are device arrays whose lowering-time value
    # fetch costs a device sync (seconds through a remote tunnel)
    return np.uint64(x)


def _u32(x):
    return np.uint32(x)


def _bitlen32(x):
    """Exact bit length of a u32 (0 -> 0): f32-exponent estimate corrected
    by one exact shift check (u32 shifts are native on TPU)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), U32)
    n = ((bits >> _u32(23)) & _u32(0xFF)).astype(jnp.int32) - 126
    r = x >> jnp.clip(n - 1, 0, 31).astype(U32)
    n = n - (r == 0).astype(jnp.int32) + (r > 1).astype(jnp.int32)
    return jnp.where(x == 0, 0, n)


def _bitlen64(x):
    """Exact bit length of a u64 (0 -> 0) via its u32 halves."""
    hi = (x >> _u(32)).astype(U32)
    lo = x.astype(U32)
    return jnp.where(hi > 0, 32 + _bitlen32(hi), _bitlen32(lo)).astype(jnp.int64)


def _shr(x, s):
    """Variable right shift for u64, s in [0, 63], as two u32 half shifts."""
    s32 = s.astype(U32)
    hi = (x >> _u(32)).astype(U32)
    lo = x.astype(U32)
    slo = s32 & _u32(31)
    carry = jnp.where(slo == 0, _u32(0), hi << ((_u32(32) - slo) & _u32(31)))
    lo1 = (lo >> slo) | carry
    hi1 = hi >> slo
    big = (s32 & _u32(32)) != 0
    lo2 = jnp.where(big, hi1, lo1)
    hi2 = jnp.where(big, _u32(0), hi1)
    return (hi2.astype(U64) << _u(32)) | lo2.astype(U64)


def _shl(x, s):
    """Variable left shift for u64, s in [0, 63], as two u32 half shifts."""
    s32 = s.astype(U32)
    hi = (x >> _u(32)).astype(U32)
    lo = x.astype(U32)
    slo = s32 & _u32(31)
    carry = jnp.where(slo == 0, _u32(0), lo >> ((_u32(32) - slo) & _u32(31)))
    hi1 = (hi << slo) | carry
    lo1 = lo << slo
    big = (s32 & _u32(32)) != 0
    hi2 = jnp.where(big, lo1, hi1)
    lo2 = jnp.where(big, _u32(0), lo1)
    return (hi2.astype(U64) << _u(32)) | lo2.astype(U64)


def _digit(num, dn, dn64, rcp, rounds):
    """Exact (floor(num/dn), num mod dn) for num < 2^57, dn in [2^30, 2^31).

    f32-reciprocal estimate, one multiplicative refinement, then `rounds`
    +-1 correction steps (enough for the residual estimator error)."""
    e = (num.astype(jnp.float32) * rcp).astype(jnp.int64)
    r = num.astype(jnp.int64) - e * dn64
    c = (r.astype(jnp.float32) * rcp).astype(jnp.int64)
    q = e + c
    r = r - c * dn64
    for _ in range(rounds):
        under = r < 0
        over = r >= dn64
        q = q + jnp.where(over, 1, 0) - jnp.where(under, 1, 0)
        r = r + jnp.where(under, dn64, 0) - jnp.where(over, dn64, 0)
    return q, r


def _jump_body(state, n):
    key, b, j, active = state
    b = jnp.where(active, j, b)
    key = jnp.where(active, key * _u(_LCG) + _u(1), key)

    d32 = (key >> _u(33)).astype(U32) + _u32(1)  # in [1, 2^31]
    t = _bitlen32(d32) - 1  # floor(log2 d), 0..31

    # ---- q = RN(2^31/d): mantissa m = RNE(2^83/dn), exponent 30-t ----------
    dn = d32 << jnp.clip(30 - t, 0, 30).astype(U32)  # [2^30, 2^31) for t<=30
    dn64 = dn.astype(jnp.int64)
    rcp = np.float32(1.0) / dn.astype(jnp.float32)
    d1, r1 = _digit(jnp.full_like(dn64, 1 << 57), dn, dn64, rcp, 2)
    d2, r2 = _digit(r1 << 26, dn, dn64, rcp, 3)
    m = ((d1.astype(U64) << _u(26)) + d2.astype(U64))  # floor(2^83/dn), 53 bits
    # round half to even
    up = (2 * r2 > dn64) | ((2 * r2 == dn64) & ((m & _u(1)) == _u(1)))
    m = m + jnp.where(up, _u(1), _u(0))

    # ---- p = RN(B * q) ------------------------------------------------------
    B = (b + 1).astype(U64)  # <= 2^31
    m_hi = m >> _u(32)  # constant shift, < 2^22
    m_lo = m & _u(0xFFFFFFFF)
    t0 = B * m_lo  # < 2^63
    t1 = B * m_hi  # < 2^53
    p_lo = (t1 << _u(32)) + t0  # wrapping
    p_hi = (t1 + (t0 >> _u(32))) >> _u(32)  # exact 128-bit high word

    nbits = jnp.where(
        p_hi > 0, 64 + _bitlen32(p_hi.astype(U32)).astype(jnp.int64), _bitlen64(p_lo)
    )
    shift = jnp.maximum(nbits - 53, 0)  # 0..32
    hi_part = jnp.where(shift > 0, _shl(p_hi, 64 - shift), _u(0))
    main = jnp.where(shift > 0, hi_part | _shr(p_lo, shift), p_lo)
    g_pos = jnp.clip(shift - 1, 0, 63)
    guard = jnp.where(shift > 0, _shr(p_lo, g_pos) & _u(1), _u(0))
    sticky_mask = _shl(jnp.full_like(p_lo, 1), g_pos) - _u(1)
    sticky = jnp.where(shift > 1, (p_lo & sticky_mask) != _u(0), False)
    roundup = (guard == _u(1)) & (sticky | ((main & _u(1)) == _u(1)))
    main = main + jnp.where(roundup, _u(1), _u(0))

    # ---- j = trunc(p), p = main * 2^exp2, exp2 = shift + (30-t) - 52 -------
    exp2 = shift + (30 - t) - 52
    jpos = _shl(main, jnp.clip(exp2, 0, 63))
    jneg = _shr(main, jnp.clip(-exp2, 0, 63))
    jj = jnp.where(exp2 >= 0, jpos, jneg).astype(jnp.int64)
    # d = 2^31 (t=31) is the one case the normalization can't reach:
    # q = RN(2^31/2^31) = 1.0 exactly, so p = RN(B*1.0) = B and j = b+1.
    jj = jnp.where(d32 == _u32(0x80000000), b + 1, jj)

    j = jnp.where(active, jj, j)
    active = active & (j < n)
    return key, b, j, active


def jump_hash_exact_jnp(key, num_buckets: int):
    """Bit-exact Go jump hash on any backend, including TPU."""
    n = np.int64(num_buckets)
    key = key.astype(U64)

    zeros = jnp.zeros_like(key, dtype=jnp.int64)
    state0 = (key, zeros - 1, zeros, zeros < n)

    def cond(state):
        return jnp.any(state[3])

    _, b, _, _ = jax.lax.while_loop(cond, lambda s: _jump_body(s, n), state0)
    return b.astype(jnp.int32)
