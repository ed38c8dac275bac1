"""Bit-exact replica of Go's math/rand default source (rngSource).

The reference (will-rowe/hulk) derives its Consistent Weighted Sampling tables
from `leesper/go_rng` generators, which wrap `rand.New(rand.NewSource(seed))`
(reference: src/histosketch/histosketch.go:103-104, DISTRIBUTION_SEED=1).
Reproducing those tables bit-for-bit therefore requires Go's exact PRNG:

* a 607/273 additive lagged-Fibonacci generator over int64,
* seeded by a Lehmer LCG stream XORed with the baked-in `rngCooked` table.

`rngCooked` is reconstructed (scripts/gen_rng_cooked.py) by jump-ahead over
the linear recurrence and shipped as _data/rng_cooked.npy; the reconstruction
is validated against the well-known Go seed-1 outputs (5577006791947779410,
8674665223082153551) and the table's published first entry.

Float64 follows Go exactly: Int63()/2^63 with redraw when the division rounds
to 1.0 (math/rand/rand.go Float64).
"""
from __future__ import annotations

import os

import numpy as np

_LEN = 607
_TAP = 273
_FEEDGAP = _LEN - _TAP  # 334
_M31 = (1 << 31) - 1
_MASK63 = (1 << 63) - 1
_U64 = np.uint64

_COOKED_PATH = os.path.join(os.path.dirname(__file__), "_data", "rng_cooked.npy")
_cooked_cache = None


def _rng_cooked() -> np.ndarray:
    global _cooked_cache
    if _cooked_cache is None:
        _cooked_cache = np.load(_COOKED_PATH).view(_U64)
        if _cooked_cache.shape != (_LEN,):
            raise ValueError("corrupt rng_cooked table")
    return _cooked_cache


def _seedrand(x: int) -> int:
    """Go math/rand seedrand: x = 48271*x mod 2^31-1 (Schrage)."""
    hi, lo = divmod(x, 44488)
    x = 48271 * lo - 3399 * hi
    if x < 0:
        x += _M31
    return x


class GoRand:
    """Replica of rand.New(rand.NewSource(seed)) producing identical streams.

    Scalar methods mirror Go call-for-call; ``float64_block`` produces the
    same stream in bulk (vectorised ALFG stepping in blocks of 273, the
    largest lag-safe batch).
    """

    def __init__(self, seed: int):
        self.vec = np.zeros(_LEN, dtype=_U64)
        self._seed(seed)
        # history in sequence order: hist[j] = x_{n-606+j}; reconstruct from
        # vec layout: vec[i] holds x_n with (334-n) mod 607 == i.
        idx = np.arange(_LEN)
        self._hist = np.empty(_LEN, dtype=_U64)
        self._hist[np.where(idx <= 333, 333 - idx, 940 - idx)] = self.vec
        self._buf = np.empty(0, dtype=np.int64)
        self._pos = 0

    def _seed(self, seed: int) -> None:
        cooked = _rng_cooked()
        seed %= _M31
        if seed < 0:
            seed += _M31
        if seed == 0:
            seed = 89482311
        x = seed
        for i in range(-20, _LEN):
            x = _seedrand(x)
            if i >= 0:
                u = x << 40
                x = _seedrand(x)
                u ^= x << 20
                x = _seedrand(x)
                u ^= x
                u ^= int(cooked[i])
                self.vec[i] = _U64(u & 0xFFFFFFFFFFFFFFFF)

    # ---- bulk generation -------------------------------------------------

    def _gen_block(self) -> np.ndarray:
        """Advance 273 steps, returning Int63 values (int64, non-negative)."""
        h = self._hist
        new = h[0:_TAP] + h[_FEEDGAP:_LEN]  # x_m = x_{m-607} + x_{m-273}
        self._hist = np.concatenate([h[_TAP:], new])
        return (new & _U64(_MASK63)).view(np.int64)

    def _refill(self, need: int) -> None:
        blocks = [self._buf[self._pos :]]
        have = blocks[0].shape[0]
        while have < need:
            b = self._gen_block()
            blocks.append(b)
            have += b.shape[0]
        self._buf = np.concatenate(blocks)
        self._pos = 0

    def int63_block(self, n: int) -> np.ndarray:
        if self._buf.shape[0] - self._pos < n:
            self._refill(n)
        out = self._buf[self._pos : self._pos + n]
        self._pos += n
        return out

    def float64_block(self, n: int) -> np.ndarray:
        """n consecutive Go Float64 draws (handles the redraw-on-1.0 rule)."""
        raw = self.int63_block(n).astype(np.float64) / float(1 << 63)
        while np.any(raw == 1.0):  # probability ~2^-53 per draw
            bad = np.nonzero(raw == 1.0)[0]
            i = int(bad[0])
            # redraw at position i, shifting the remainder of the stream
            tail = raw[i + 1 :]
            repl = self.int63_block(1).astype(np.float64) / float(1 << 63)
            raw = np.concatenate([raw[:i], tail, repl])
        return raw

    # ---- scalar API (exact call-for-call mirror) -------------------------

    def uint64(self) -> int:
        return int(self.int63_block(1)[0])  # note: only 63-bit stream exposed

    def int63(self) -> int:
        return int(self.int63_block(1)[0])

    def float64(self) -> float:
        while True:
            f = self.int63() / float(1 << 63)
            if f != 1.0:
                return f

    def float64_range(self, a: float, b: float) -> float:
        """go_rng UniformGenerator.Float64Range: a + (b-a)*Float64()."""
        if not a < b:
            raise ValueError("invalid range")
        return a + (b - a) * self.float64()
