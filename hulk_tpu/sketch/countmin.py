"""Count-Min sketch with optional concept-drift decay.

Mirrors src/countmin/countmin.go: EPSILON=0.001/DELTA=0.99 give a fixed
7 x 2000 float64 counter matrix; the per-row "hash" is element + d*element
(uint64 wrap) fed to the jump hash; Add() optionally decays ALL counters by
exp(-decayRatio) first (computed with the Go math.Exp port so the decay
constant matches bit-for-bit), then returns the post-increment minimum.
"""
from __future__ import annotations

import math

import numpy as np

from hulk_tpu.hashes.fdlibm import go_exp
from hulk_tpu.hashes.jumphash import jump_hash_np

EPSILON = 0.001
DELTA = 0.99


def cms_shape(epsilon: float = EPSILON, delta: float = DELTA) -> tuple[int, int]:
    g = int(math.ceil(2.0 / epsilon))
    d = int(math.ceil(math.log(1.0 - delta) / math.log(0.5)))
    return d, g


def cms_row_bins(elements: np.ndarray, depth: int, width: int) -> np.ndarray:
    """[depth, n] jump-hash positions for a batch of elements (vectorised
    replica of countmin.go traverse hashing)."""
    e = elements.astype(np.uint64)
    rows = []
    for d in range(depth):
        h = e + np.uint64(d) * e  # wraps mod 2^64 like Go
        rows.append(jump_hash_np(h, width))
    return np.stack(rows, axis=0)


class CountMinSketch:
    def __init__(self, epsilon: float = EPSILON, delta: float = DELTA, decay_ratio: float = 1.0):
        self.depth, self.width = cms_shape(epsilon, delta)
        self.sketch = np.zeros((self.depth, self.width), dtype=np.float64)
        if 0.0 < decay_ratio < 1.0:
            self.decay_weight = float(go_exp(-decay_ratio))
            self.apply_scaling = True
        else:
            self.decay_weight = 0.0
            self.apply_scaling = False

    def add(self, element: int, increment: float) -> float:
        if self.apply_scaling:
            self.sketch *= self.decay_weight
        return self._traverse(int(element), float(increment))

    def _traverse(self, element: int, increment: float) -> float:
        bins = cms_row_bins(np.array([element], dtype=np.uint64), self.depth, self.width)[:, 0]
        if increment != 0.0:
            self.sketch[np.arange(self.depth), bins] += increment
        return float(self.sketch[np.arange(self.depth), bins].min())

    def get_estimate(self, element: int) -> float:
        return self._traverse(int(element), 0.0)

    def add_many(self, row_bins: np.ndarray, increments: np.ndarray) -> np.ndarray:
        """Sequential batch add with precomputed per-row bins.

        row_bins: [depth, n] int32 (from cms_row_bins), increments: [n].
        Returns the post-increment minima [n]. The loop is sequential because
        estimates depend on prior elements via counter collisions
        (see SURVEY.md §3.4), but each step is vectorised across rows.
        """
        n = increments.shape[0]
        out = np.empty(n, dtype=np.float64)
        rows = np.arange(self.depth)
        q = self.sketch
        decay = self.decay_weight
        scaling = self.apply_scaling
        for i in range(n):
            if scaling:
                q *= decay
            cols = row_bins[:, i]
            q[rows, cols] += increments[i]
            out[i] = q[rows, cols].min()
        return out
