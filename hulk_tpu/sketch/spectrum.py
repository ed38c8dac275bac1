"""K-mer spectrum: the fixed-size histogram minimizers are binned into.

Mirrors src/kmerspectrum/kmerspectrum.go — numBins = k^4 by CLI convention
(cmd/sketch.go:118), binning via jump hash, nonzero bins dumped in ascending
order (the ordering that makes downstream histosketching deterministic), the
MIN_USED_BINS < 1% occupancy fatal, and Wipe() between interval flushes.

Host state is a dense float64 array; device-side accumulation produces the
same dense histogram (integer-valued f64 counts merge exactly across shards
via psum), so the two paths are interchangeable.
"""
from __future__ import annotations

import numpy as np

from hulk_tpu.hashes.jumphash import jump_hash_np

MIN_USED_BINS = 0.01


class SpectrumError(ValueError):
    pass


class KmerSpectrum:
    def __init__(self, num_bins: int):
        if num_bins < 0:
            raise SpectrumError(
                f"negative value used for number of k-mer spectrum bins: {num_bins}"
            )
        self.num_bins = int(num_bins)
        self.bins = np.zeros(self.num_bins, dtype=np.float64)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Bin a batch of minimizer hashes (uint64) and increment counts."""
        if hashes.size == 0:
            return
        b = jump_hash_np(hashes, self.num_bins)
        np.add.at(self.bins, b, 1.0)

    def add_bins(self, bin_ids: np.ndarray, counts: np.ndarray) -> None:
        """Merge a precomputed partial histogram (device path / psum result)."""
        np.add.at(self.bins, bin_ids, counts)

    def add_dense(self, dense: np.ndarray) -> None:
        self.bins += dense

    def cardinality(self) -> int:
        return int(np.count_nonzero(self.bins))

    def wipe(self) -> None:
        self.bins[:] = 0.0

    def dump(self):
        """(bin_ids int64 ascending, frequencies f64) of nonzero bins.

        Raises like the reference: empty spectrum, or <1% occupancy
        (kmerspectrum.go:89-96 — small inputs are fatal by design).
        """
        used = self.cardinality()
        if used == 0:
            raise SpectrumError("k-mer spectrum is empty")
        if used / float(self.num_bins) < MIN_USED_BINS:
            raise SpectrumError("not used yet")
        ids = np.nonzero(self.bins)[0]
        return ids.astype(np.int64), self.bins[ids].copy()
