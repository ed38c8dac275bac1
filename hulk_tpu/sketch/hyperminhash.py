"""HyperMinHash: MinHash in LogLog space (Yu & Weber, arXiv:1710.08436).

No implementation exists in the reference tree (README.md:44-54 lists it as
v1.0.1 roadmap; SURVEY.md §7 item 8 flags it as a build-from-literature
target), so this is designed from the paper with self-consistency tests
rather than Go-equality.

Each of 2^p buckets stores a register packing (leading-zero count capped at
2^q-1, r low bits of the hash). Streaming update is a pure max-reduce — ideal
for vectorised/device execution and for exact psum-free merging across
shards (elementwise max commutes with sharding).

Jaccard estimation: fraction of matching non-empty registers, corrected for
random collisions (P[collision] ~= 2^-r / 3 for the uncapped geometric part;
see paper §3.3 for the exact series this approximates).
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

    def get_similarity(self, other: "HyperMinHash") -> float:
        """Collision-corrected Jaccard estimate."""
        if (self.p, self.q, self.r) != (other.p, other.q, other.r):
            raise ValueError("mismatched HyperMinHash parameters")
        a, b = self.registers, other.registers
        both = (a != 0) & (b != 0)
        either = (a != 0) | (b != 0)
        u = int(np.count_nonzero(either))
        if u == 0:
            return 0.0
        c = int(np.count_nonzero(both & (a == b)))
        ec = np.count_nonzero(both) * (2.0 ** -self.r) / 3.0
        denom = u - ec
        if denom <= 0:
            return 0.0
        return float(np.clip((c - ec) / denom, 0.0, 1.0))

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
