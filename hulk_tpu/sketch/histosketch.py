"""HistoSketch: similarity-preserving sketch of a streaming histogram
(Yang et al., ICDM'17), mirroring src/histosketch/histosketch.go including its
deviations from the paper (pre-multiplied beta*r table; CMS-estimated
frequencies; fixed DISTRIBUTION_SEED=1 making CWS tables identical across
runs/samples — the property that makes sketches comparable).

Update rule per incoming (bin, freq) element (histosketch.go:129-155):
    estiFreq = CMS.Add(bin, freq)                  # sequential state
    for each slot j:
        Yka  = exp(log(estiFreq) - b[j][bin])
        Aka  = c[j][bin] / (Yka * exp(r[j][bin]))
        curMin = weights[j] (/ decayWeight under concept drift)
        if Aka < curMin: sketch[j], weights[j] = bin, Aka

This host implementation uses the Go math.Exp/Log ports so weights match the
reference bit-for-bit; exp(r) is precomputed (a deterministic function of r,
hence bit-identical to calling exp at use time).
"""
from __future__ import annotations

import numpy as np

from hulk_tpu.hashes.cws import CWSTables, get_cws_tables
from hulk_tpu.hashes.fdlibm import go_exp, go_log
from hulk_tpu.sketch.countmin import CountMinSketch, cms_row_bins

MAX_K = 31
MAX_FLOAT64 = np.finfo(np.float64).max


class HistoSketch:
    algorithm = "histosketch"

    def __init__(
        self,
        kmer_size: int,
        sketch_size: int,
        num_bins: int,
        decay_ratio: float,
        tables: CWSTables | None = None,
    ):
        if kmer_size > MAX_K:
            raise ValueError(f"histosketching only supports k <= {MAX_K}")
        if not 0.0 <= decay_ratio <= 1.0:
            raise ValueError("decay ratio must be between 0.0 and 1.0")
        if num_bins < 2:
            raise ValueError("histogram must have at least 2 bins")
        self.kmer_size = int(kmer_size)
        self.sketch_size = int(sketch_size)
        self.dimensions = int(num_bins)
        self.apply_concept_drift = decay_ratio != 1.0
        self.sketch = np.zeros(self.sketch_size, dtype=np.uint64)
        self.sketch_weights = np.full(self.sketch_size, MAX_FLOAT64, dtype=np.float64)
        self.cms = CountMinSketch(decay_ratio=decay_ratio)
        self.cws = tables if tables is not None else get_cws_tables(self.sketch_size, self.dimensions)
        self.md5sum = ""

    # ---- streaming update ------------------------------------------------

    def add_element(self, bin_id: int, value: float) -> None:
        esti = self.cms.add(bin_id, value)
        self._cws_update(int(bin_id), esti)

    def _cws_update(self, bin_id: int, esti_freq: float) -> None:
        yka = go_exp(go_log(esti_freq) - self.cws.b[:, bin_id])
        aka = self.cws.c[:, bin_id] / (yka * self.cws.exp_r[:, bin_id])
        with np.errstate(over="ignore"):  # MaxFloat64/decay -> +Inf, as in Go
            if self.apply_concept_drift:
                cur_min = self.sketch_weights / self.cms.decay_weight
            else:
                cur_min = self.sketch_weights
        better = aka < cur_min
        self.sketch[better] = np.uint64(bin_id)
        self.sketch_weights[better] = aka[better]

    def add_elements(self, bin_ids: np.ndarray, freqs: np.ndarray) -> None:
        """Flush a dumped spectrum (ascending bins) through the sketch.

        Equivalent to add_element per (bin, freq) pair; CMS row positions are
        precomputed in one vectorised pass, then the inherently-sequential
        scan runs with vectorised per-slot inner updates.
        """
        if bin_ids.size == 0:
            return
        row_bins = cms_row_bins(bin_ids.astype(np.uint64), self.cms.depth, self.cms.width)
        estis = self.cms.add_many(row_bins, freqs.astype(np.float64))
        log_estis = go_log(estis)
        b_t = self.cws.b
        c_t = self.cws.c
        er_t = self.cws.exp_r
        drift = self.apply_concept_drift
        dw = self.cms.decay_weight
        sketch = self.sketch
        weights = self.sketch_weights
        with np.errstate(over="ignore"):  # MaxFloat64/decay -> +Inf, as in Go
            for i in range(bin_ids.shape[0]):
                jbin = int(bin_ids[i])
                yka = go_exp(log_estis[i] - b_t[:, jbin])
                aka = c_t[:, jbin] / (yka * er_t[:, jbin])
                cur_min = weights / dw if drift else weights
                better = aka < cur_min
                sketch[better] = np.uint64(jbin)
                weights[better] = aka[better]

    # ---- accessors mirroring the SketchObject interface -------------------

    def get_sketch(self) -> np.ndarray:
        return self.sketch.copy()

    def get_algo(self) -> str:
        return self.algorithm

    def set_md5(self) -> None:
        from hulk_tpu.io.sketchio import md5sum_u64

        self.md5sum = md5sum_u64(self.sketch)

    def get_md5(self) -> str:
        return self.md5sum
