"""Distance metrics over sketches, mirroring src/distances/distances.go.

`jaccard` is positional equality (1 - matches/len); `weightedjaccard` is the
weighted Jaccard distance of soda10-jaccard with per-position |w| weights.
braycurtis/canberra/euclidean are implemented for API parity (they are
unreachable from the reference CLI, whose smash whitelists only
jaccard/weightedjaccard — cmd/smash.go:30).
"""
from __future__ import annotations

import numpy as np

AVAIL_METRICS = ["jaccard", "weightedjaccard"]


def get_distance(set_a: np.ndarray, set_b: np.ndarray, metric: str) -> float:
    if set_a.shape[0] != set_b.shape[0]:
        raise ValueError(f"set size mismatch: {set_a.shape[0]} vs {set_b.shape[0]}")
    if metric == "jaccard":
        intersect = float(np.count_nonzero(set_a == set_b))
        return 1.0 - (intersect / float(set_a.shape[0]))
    if metric == "braycurtis":
        denom = float(np.sum(set_a + set_b))
        return float(np.sum(np.abs(set_a - set_b))) / denom if denom else 0.0
    if metric == "canberra":
        num = np.abs(set_a - set_b)
        den = np.abs(set_a) + np.abs(set_b)
        with np.errstate(invalid="ignore", divide="ignore"):
            terms = np.where(den != 0, num / den, 0.0)
        return float(np.sum(terms))
    if metric == "euclidean":
        return float(np.sqrt(np.sum((set_a - set_b) ** 2)))
    raise ValueError(f"unknown distance metric: {metric}")


def get_wjd(set_a, set_b, weights_a, weights_b) -> float:
    """Weighted Jaccard distance — scalar loop semantics of distances.go:44-72,
    vectorised (summation order across positions matters for float equality,
    so partial sums are accumulated in index order via cumulative sum of the
    per-position contributions… which is exactly left-to-right addition)."""
    intersect, union = 0.0, 0.0
    wa = np.abs(np.asarray(weights_a, dtype=np.float64))
    wb = np.abs(np.asarray(weights_b, dtype=np.float64))
    eq = np.asarray(set_a) == np.asarray(set_b)
    # left-to-right accumulation to match Go's sequential += exactly
    for i in range(wa.shape[0]):
        if eq[i]:
            if wa[i] < wb[i]:
                intersect += wa[i]
                union += wb[i]
            else:
                intersect += wb[i]
                union += wa[i]
        else:
            union += wa[i] if wa[i] > wb[i] else wb[i]
    return 1.0 - (intersect / union)
