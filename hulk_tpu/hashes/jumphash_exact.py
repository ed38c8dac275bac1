"""Jump hash with integer-emulated IEEE float64 arithmetic — for TPU.

TPU f64 division/multiplication are not correctly rounded (measured up to
~200 ULP here), so the float path (jumphash.py) produces ~1% wrong buckets on
TPU. This module computes the exact same buckets as Go's

    j = int64(float64(b+1) * (float64(1<<31) / float64((key>>33)+1)))

by emulating both IEEE round-to-nearest-even roundings with pure 64-bit
integer ops:

  1. q = RN(2^31 / d): mantissa m = RNE(2^(t+53) / d) via exact u64 division,
     exponent 30-t, where t = floor(log2 d).
  2. p = RN(B * q), B = b+1 <= 2^31: the exact 85-bit product B*m is formed as
     a (hi, lo) pair and rounded half-even to 53 significant bits.
  3. j = trunc(p): mantissa shifted by the binary exponent.

TPU lowering constraints (measured):
  * u64 variable right-shift compiles for ~7 min and u64 divide lowers to a
    very slow loop, so right-shifts use a two-level constant-shift select
    chain and divisions are float-assisted: the (inexact) f64 divide only
    *estimates* the quotient, which is then corrected with exact integer
    multiply-subtract steps — the result is provably exact for estimator
    error up to +-3 (actual TPU error is <<1 after the second stage).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import hulk_tpu._jax_config  # noqa: F401

_LCG = 2862933555777941757
U64 = jnp.uint64


def _u(x) -> jnp.ndarray:
    return jnp.uint64(x)


def _bitlen(x):
    """Bit length of u64 (0 for 0), constant shifts only."""
    n = jnp.zeros(x.shape, dtype=jnp.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        big = x >= (_u(1) << _u(sh))
        n = n + jnp.where(big, sh, 0)
        x = jnp.where(big, x >> sh, x)  # constant shift
    return n + jnp.where(x > 0, 1, 0).astype(jnp.int64)


def _shr(x, s):
    """Variable right shift for s in [0, 63] via constant-shift selects."""
    hi = s & 48  # 0,16,32,48
    out = x
    for lvl in (16, 32, 48):
        out = jnp.where(hi == lvl, x >> lvl, out)
    lo = (s - hi).astype(jnp.int64)  # 0..15
    res = out
    for c in range(1, 16):
        res = jnp.where(lo == c, out >> c, res)
    return res


def _div_u64_by_u31(num, d):
    """Exact floor(num/d) and num mod d for u64 num, d in [1, 2^31).

    Uses TPU's (approximate) f64 divide as an estimator and corrects with
    exact integer steps. Estimator error analysis: f64 conversion + divide
    are within ~1e-12 relative here, so after the second refinement the
    quotient is within +-3; three fixed correction steps finish the job.
    """
    nf = num.astype(jnp.float64)
    df = d.astype(jnp.float64)
    q = jnp.clip(nf / df, 0.0, 1.9e19).astype(U64)
    # r = num - q*d as signed (|r| bounded by estimator error * d < 2^62)
    r = (num - q * d).astype(jnp.int64)
    # second-stage refinement
    corr = (r.astype(jnp.float64) / df).astype(jnp.int64)
    q = (q.astype(jnp.int64) + corr).astype(U64)
    r = (num - q * d).astype(jnp.int64)
    di = d.astype(jnp.int64)
    for _ in range(3):
        under = r < 0
        over = r >= di
        q = jnp.where(under, q - _u(1), jnp.where(over, q + _u(1), q))
        r = jnp.where(under, r + di, jnp.where(over, r - di, r))
    return q, r.astype(U64)


def _jump_body(state, n):
    key, b, j, active = state
    if True:
        b = jnp.where(active, j, b)
        key = jnp.where(active, key * _u(_LCG) + _u(1), key)

        d = (key >> 33) + _u(1)  # constant shift; d in [1, 2^31]
        t = _bitlen(d) - 1  # floor(log2 d), 0..31

        # ---- q = RN(2^31/d): mantissa m, exponent e = 30-t ----------------
        # numerator 2^(t+53); path A (t<=10) derives from the 2^63 division
        # via floor(2^s/d) == floor(2^63/d) >> (63-s), path B refines upward
        u1, r1 = _div_u64_by_u31(jnp.full_like(d, (1 << 63)), d)

        shA = jnp.clip(10 - t, 0, 10)  # 63 - (t+53) for path A
        uA = _shr(u1, shA)
        sA = jnp.clip(t + 53, 0, 63).astype(U64)
        rA = (_u(1) << sA) - uA * d

        sh = jnp.clip(t - 10, 0, 20).astype(U64)  # s-63 for path B
        r1s = r1 << sh
        q2, rB = _div_u64_by_u31(r1s, d)
        uB = (u1 << sh) + q2

        pathA = t <= 10
        m = jnp.where(pathA, uA, uB)
        r = jnp.where(pathA, rA, rB)
        # round half to even
        up = (2 * r > d) | ((2 * r == d) & ((m & _u(1)) == _u(1)))
        m = m + jnp.where(up, _u(1), _u(0))
        # q's exponent: e = 30 - t (m may be 2^53 — unnormalised is fine)

        # ---- p = RN(B * q) -------------------------------------------------
        B = (b + 1).astype(U64)  # <= 2^31
        m_hi = m >> 32  # constant shift, < 2^22
        m_lo = m & _u(0xFFFFFFFF)
        t0 = B * m_lo  # < 2^63
        t1 = B * m_hi  # < 2^53
        p_lo = (t1 << 32) + t0  # wrapping
        p_hi = (t1 + (t0 >> 32)) >> 32  # exact 128-bit high word

        nbits = jnp.where(p_hi > 0, 64 + _bitlen(p_hi), _bitlen(p_lo))
        shift = jnp.maximum(nbits - 53, 0)  # 0..32
        hi_part = jnp.where(
            shift > 0, p_hi << jnp.clip(64 - shift, 0, 63).astype(U64), _u(0)
        )
        main = jnp.where(shift > 0, hi_part | _shr(p_lo, shift), p_lo)
        g_pos = jnp.clip(shift - 1, 0, 63)
        guard = jnp.where(shift > 0, _shr(p_lo, g_pos) & _u(1), _u(0))
        sticky_mask = (_u(1) << g_pos.astype(U64)) - _u(1)
        sticky = jnp.where(shift > 1, (p_lo & sticky_mask) != _u(0), False)
        roundup = (guard == _u(1)) & (sticky | ((main & _u(1)) == _u(1)))
        main = main + jnp.where(roundup, _u(1), _u(0))

        # ---- j = trunc(p), p = main * 2^exp2, exp2 = shift + (30-t) - 52 ---
        exp2 = shift + (30 - t) - 52
        jpos = main << jnp.clip(exp2, 0, 63).astype(U64)
        jneg = _shr(main, jnp.clip(-exp2, 0, 63))
        jj = jnp.where(exp2 >= 0, jpos, jneg).astype(jnp.int64)

        j = jnp.where(active, jj, j)
        active = active & (j < n)
    return key, b, j, active


def jump_hash_exact_jnp(key, num_buckets: int):
    """Bit-exact Go jump hash on any backend, including TPU."""
    n = jnp.int64(num_buckets)
    key = key.astype(U64)

    zeros = jnp.zeros_like(key, dtype=jnp.int64)
    state0 = (key, zeros - 1, zeros, zeros < n)

    def cond(state):
        return jnp.any(state[3])

    _, b, _, _ = jax.lax.while_loop(cond, lambda s: _jump_body(s, n), state0)
    return b.astype(jnp.int32)
