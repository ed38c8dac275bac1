"""HyperMinHash: MinHash in LogLog space (Yu & Weber, arXiv:1710.08436).

No implementation exists in the reference tree (README.md:44-54 lists it as
v1.0.1 roadmap; SURVEY.md §7 item 8 flags it as a build-from-literature
target), so this is designed from the paper with self-consistency tests
rather than Go-equality.

Each of 2^p buckets stores a register packing (leading-zero count capped at
2^q-1, r low bits of the hash). Streaming update is a pure max-reduce — ideal
for vectorised/device execution and for exact psum-free merging across
shards (elementwise max commutes with sharding).

Jaccard estimation: fraction of matching non-empty registers, corrected by
the paper's §3.3 expected-collision count — the exact double series over
(leading-zero value, r-bit value) cells of P[x's bucket minimum lands in
the cell] * P[y's] summed over all 2^p buckets, with the paper's
closed-form asymptotic (0.169919... * 2^(r-p) * 4(n/m)/((1+n/m)^2)) above
n > 2^(p+5) where the series saturates float64.
"""
from __future__ import annotations

import numpy as np

DEFAULT_P = 10  # 1024 buckets
DEFAULT_Q = 6  # lz counter bits (cap 63)
DEFAULT_R = 16  # fractional bits


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: spreads input bits over all 64 output bits.
    Minimizer values occupy only the low 2k+8 bits (hash<<8|span), so the
    raw values would collapse every element into bucket 0 without this."""
    z = x.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    n = np.zeros(x.shape, dtype=np.int64)
    x = x.copy()
    for sh in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(sh))
        n[big] += sh
        x[big] >>= np.uint64(sh)
    n[x > 0] += 1
    return n


class HyperMinHash:
    algorithm = "hyperminhash"

    def __init__(self, kmer_size: int, p: int = DEFAULT_P, q: int = DEFAULT_Q, r: int = DEFAULT_R):
        if not 4 <= p <= 20:
            raise ValueError("hyperminhash p must be in [4, 20]")
        self.kmer_size = int(kmer_size)
        self.p, self.q, self.r = p, q, r
        self.registers = np.zeros(1 << p, dtype=np.uint64)
        self.md5sum = ""

    # ---- updates ---------------------------------------------------------

    def add_hash(self, hv: int) -> None:
        self.add_hashes(np.array([hv], dtype=np.uint64))

    def add_hashes(self, hvs: np.ndarray) -> None:
        if hvs.size == 0:
            return
        h = _mix64(hvs)
        p, q, r = self.p, self.q, self.r
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)  # remaining 64-p bits, shifted to the top
        # rank = leading zeros within the window + 1 (1-based), capped
        lz = (64 - _bitlen_u64(rest) + 1).astype(np.int64)
        lz = np.minimum(lz, (1 << q) - 1)
        rbits = (h & np.uint64((1 << r) - 1)).astype(np.uint64)
        # register orders by (lz asc is worse): maximize lz, then minimize
        # rbits -> encode value = (lz << r) | (2^r-1 - rbits), take max
        enc = (lz.astype(np.uint64) << np.uint64(r)) | (
            np.uint64((1 << r) - 1) - rbits
        )
        np.maximum.at(self.registers, bucket, enc)

    def merge(self, other: "HyperMinHash") -> None:
        if (self.p, self.q, self.r) != (other.p, other.q, other.r):
            raise ValueError("mismatched HyperMinHash parameters")
        self.registers = np.maximum(self.registers, other.registers)

    # ---- estimators ------------------------------------------------------

    def cardinality(self) -> float:
        """HLL-style estimate from the lz parts."""
        m = self.registers.shape[0]
        lz = (self.registers >> np.uint64(self.r)).astype(np.float64)
        # standard HLL with alpha_m correction
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -lz))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        return float(est)

    def expected_collisions(self, n: float, m: float) -> float:
        """Paper §3.3: expected number of register collisions between two
        INDEPENDENT random sets of cardinalities n and m.

        Exact series: a register cell is (i, j) with i the capped
        leading-zero value and j the r-bit value; the bucket minimum of a
        random n-set lands in cell (i, j) with probability
        (1-b2)^n - (1-b1)^n where [b1, b2) is the cell's sub-interval of
        [0, 1). Independent sketches collide in a bucket with the product
        probability, summed over cells and scaled by 2^p buckets. Above
        n > 2^(p+5) the series is numerically degenerate ((1-b)^n
        underflows) and the paper's closed-form asymptotic is used."""
        p, q, r = self.p, self.q, self.r
        if n < m:
            n, m = m, n
        if n == 0:
            return 0.0
        if n > 2.0 ** (2 ** q + r):
            # beyond the sketch's representable range: no reliable estimate
            return float("inf")
        if n > 2.0 ** (p + 5):
            ratio = n / m
            d = (4.0 * ratio) / ((1.0 + ratio) ** 2)
            return 0.169919487159739093975315012348 * (2.0 ** (r - p)) * d
        x = 0.0
        j = np.arange(1, (1 << r) + 1, dtype=np.float64)
        two_r = float(1 << r)
        for i in range(1, (1 << q) + 1):
            if i != (1 << q):
                b1 = (two_r + j) / (2.0 ** (p + r + i))
                b2 = (two_r + j + 1.0) / (2.0 ** (p + r + i))
            else:
                b1 = j / (2.0 ** (p + r + i - 1))
                b2 = (j + 1.0) / (2.0 ** (p + r + i - 1))
            prx = np.power(1.0 - b2, n) - np.power(1.0 - b1, n)
            pry = np.power(1.0 - b2, m) - np.power(1.0 - b1, m)
            x += float(np.sum(prx * pry))
        return x * (2.0 ** p) + 0.5

    def get_similarity(self, other: "HyperMinHash") -> float:
        """Jaccard estimate with the paper's §3.3 expected-collision
        correction: (C - EC) / union, C = matching non-empty registers."""
        if (self.p, self.q, self.r) != (other.p, other.q, other.r):
            raise ValueError("mismatched HyperMinHash parameters")
        a, b = self.registers, other.registers
        if np.array_equal(a, b):
            # the J -> 1 limit: EC models INDEPENDENT sets and does not
            # apply to identical sketches (also pins self-distance to 0)
            return 1.0 if a.any() else 0.0
        both = (a != 0) & (b != 0)
        either = (a != 0) | (b != 0)
        u = int(np.count_nonzero(either))
        if u == 0:
            return 0.0
        c = int(np.count_nonzero(both & (a == b)))
        ec = self.expected_collisions(self.cardinality(), other.cardinality())
        if not np.isfinite(ec):
            return 0.0
        return float(np.clip((c - ec) / u, 0.0, 1.0))

    # ---- SketchObject interface ------------------------------------------

    def get_sketch(self) -> np.ndarray:
        return self.registers.copy()

    def get_algo(self) -> str:
        return self.algorithm

    def set_md5(self) -> None:
        from hulk_tpu.io.sketchio import md5sum_u64

        self.md5sum = md5sum_u64(self.registers)

    def get_md5(self) -> str:
        return self.md5sum
