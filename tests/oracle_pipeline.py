"""Literal straight-line transcription of the reference's FULL sketching
composition — minimizers -> k-mer spectrum -> (interval flush) -> CMS ->
CWS histosketch — for end-to-end differential testing of the production
pipeline. This closes the composition gap in the Go-equality chain: each
substrate (minimizer scan, jump hash, gorand/gamma/CWS tables, fdlibm
exp/log) is independently validated elsewhere; this oracle pins how the
reference WIRES them together, element at a time, with Python ints/floats:

  * spectrum AddHash/Dump/Wipe  — kmerspectrum.go:67-112 (jump binning,
    ascending non-zero dump, wipe after flush; boss.go:112-128 skips the
    flush entirely when cardinality is 0)
  * CMS Add/scale/traverse      — countmin.go:28-58 (EPSILON/DELTA ->
    7x2000, decayWeight=exp(-ratio)), 103-147 (pre-add uniform scaling,
    elem + d*elem row hashing, post-increment running minimum)
  * histosketch AddElement      — histosketch.go:129-155 (getSample via
    exp(log(freq)-b)/..., drift divides the current slot minimum by the
    decay weight)

No vectorisation, no reordering: the only liberties are the precomputed
CWS tables (deterministic; validated bit-exact against the Go generators
in tests/test_gamma_cws.py) and exp(r) precomputation (exp is a pure
function of r — identical every call).
"""
from __future__ import annotations

import math

from hulk_tpu.hashes.fdlibm import go_exp, go_log

U64 = 0xFFFFFFFFFFFFFFFF
MAX_FLOAT64 = 1.7976931348623157e308

# countmin.go:10-14 EPSILON/DELTA and their derived dimensions
CMS_WIDTH = math.ceil(2 / 0.001)  # 2000
CMS_DEPTH = math.ceil(math.log(1 - 0.99) / math.log(0.5))  # 7


def jump_scalar(key: int, n: int) -> int:
    """dgryski/go-jump Hash(key uint64, n int) literal."""
    b, j = -1, 0
    while j < n:
        b = j
        key = (key * 2862933555777941757 + 1) & U64
        j = int(float(b + 1) * (2147483648.0 / float((key >> 33) + 1)))
    return b


class OracleCMS:
    """countmin.go literal (floats via Python float64 arithmetic)."""

    def __init__(self, decay_ratio: float):
        self.sketch = [[0.0] * CMS_WIDTH for _ in range(CMS_DEPTH)]
        if 0.0 < decay_ratio < 1.0:
            self.decay_weight = float(go_exp(-decay_ratio))
            self.apply_scaling = True
        else:
            self.decay_weight = 0.0
            self.apply_scaling = False

    def add(self, element: int, increment: float) -> float:
        if self.apply_scaling:
            for d in range(CMS_DEPTH):
                row = self.sketch[d]
                for g in range(CMS_WIDTH):
                    row[g] = row[g] * self.decay_weight
        cur = MAX_FLOAT64
        for d in range(CMS_DEPTH):
            h = (element + d * element) & U64
            g = jump_scalar(h, CMS_WIDTH)
            self.sketch[d][g] += increment
            if self.sketch[d][g] < cur:
                cur = self.sketch[d][g]
        return cur


class OracleHistoSketch:
    """histosketch.go AddElement literal over precomputed CWS tables."""

    def __init__(self, sketch_size: int, decay_ratio: float, tables):
        self.s = sketch_size
        self.sketch = [0] * sketch_size
        self.weights = [MAX_FLOAT64] * sketch_size
        self.cms = OracleCMS(decay_ratio)
        self.drift = decay_ratio != 1.0
        self.c = tables.c
        self.b = tables.b
        self.exp_r = tables.exp_r

    def add_element(self, bin_id: int, value: float) -> None:
        esti = self.cms.add(bin_id, value)
        for j in range(self.s):
            # getSample (histosketch.go:31-34); Log(freq) is recomputed per
            # slot in Go but is a pure function — hoisting is bit-neutral
            yka = float(go_exp(float(go_log(esti)) - float(self.b[j, bin_id])))
            aka = float(self.c[j, bin_id]) / (yka * float(self.exp_r[j, bin_id]))
            if self.drift:
                cur = self.weights[j] / self.cms.decay_weight
            else:
                cur = self.weights[j]
            if aka < cur:
                self.sketch[j] = bin_id
                self.weights[j] = aka


class OracleSpectrum:
    """kmerspectrum.go literal (float64 bins, ascending non-zero dump)."""

    def __init__(self, nbins: int):
        self.nbins = nbins
        self.bins = [0.0] * nbins
        self.used = set()

    def add_hash(self, kmer: int) -> None:
        b = jump_scalar(kmer, self.nbins)
        self.used.add(b)
        self.bins[b] += 1

    def cardinality(self) -> int:
        return len(self.used)

    def flush_into(self, hs: OracleHistoSketch) -> None:
        """boss.go:112-128: no-op on an untouched spectrum, else dump
        (ascending bins, non-zero frequencies) into AddElement, then wipe.
        kmerspectrum.go Dump() errors when <1% of bins are used
        (MIN_USED_BINS) — the caller treats that as fatal."""
        if self.cardinality() == 0:
            return
        if self.cardinality() / self.nbins < 0.01:
            raise ValueError("k-mer spectrum dump below MIN_USED_BINS")
        for i in range(self.nbins):
            if self.bins[i] != 0.0:
                hs.add_element(i, self.bins[i])
        self.bins = [0.0] * self.nbins
        self.used = set()


def oracle_sketch_pipeline(reads, *, k: int, w: int, sketch_size: int,
                           nbins: int, decay_ratio: float, interval: int,
                           tables):
    """The whole reference composition over an ordered read stream.
    Returns (sketch list[int], weights list[float], minimizer_count)."""
    from tests.oracle_minimizer import minimizers_of

    spectrum = OracleSpectrum(nbins)
    hs = OracleHistoSketch(sketch_size, decay_ratio, tables)
    count = 0
    for idx, read in enumerate(reads, start=1):
        for m in minimizers_of(read, k, w):
            spectrum.add_hash(m)
            count += 1
        if interval and idx % interval == 0:
            spectrum.flush_into(hs)
    spectrum.flush_into(hs)
    return hs.sketch, hs.weights, count
