"""LSH Forest index over histosketches.

No implementation exists in the reference tree — `hulk index -r
create|search -n NAME -j 0.90 -d DIR --recursive` appears only in the paper's
v0.0.2 notebooks (SURVEY.md §7 item 8) — so this is built from the standard
banded-LSH construction used by the original HULK paper's indexing scheme:

  * a sketch's s slots are split into b bands of r rows; each band's row
    values hash to a bucket key; sketches sharing >=1 band bucket are
    candidates.
  * (b, r) are chosen from the Jaccard threshold t so the S-curve
    midpoint (1/b)^(1/r) sits at t.
  * candidate ranking uses the positional-match Jaccard estimate on the full
    sketch (the same estimator smash uses), on device in blocks when the
    candidate set is large (ops/distance.py).

The index serialises to a self-describing JSON envelope ("hulk_index") with
the same version pinning conventions as sketches.
"""
from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np

from hulk_tpu.version import HULK_COMPAT_VERSION


class LSHIndexError(ValueError):
    pass


def choose_bands(sketch_size: int, jaccard_thresh: float) -> tuple[int, int]:
    """Pick (n_bands, band_rows) with b*r <= s and (1/b)^(1/r) closest to t."""
    best = (sketch_size, 1)
    best_err = float("inf")
    for r in range(1, sketch_size + 1):
        b = sketch_size // r
        if b < 1:
            break
        midpoint = (1.0 / b) ** (1.0 / r) if b > 1 else 1.0
        err = abs(midpoint - jaccard_thresh)
        if err < best_err:
            best_err = err
            best = (b, r)
    return best


def _band_key(vals: np.ndarray) -> str:
    return hashlib.blake2b(vals.astype("<u8").tobytes(), digest_size=8).hexdigest()


@dataclass
class LSHForest:
    kmer_size: int
    sketch_size: int
    jaccard_thresh: float
    n_bands: int = 0
    band_rows: int = 0
    names: list = field(default_factory=list)
    mins: np.ndarray | None = None  # [N, s] uint64
    buckets: list = field(default_factory=list)  # per band: {key: [idx]}

    def __post_init__(self):
        if self.n_bands == 0:
            self.n_bands, self.band_rows = choose_bands(
                self.sketch_size, self.jaccard_thresh
            )
        if self.mins is None:
            self.mins = np.empty((0, self.sketch_size), dtype=np.uint64)
        if not self.buckets:
            self.buckets = [dict() for _ in range(self.n_bands)]
        self._pending: list = []

    # ---- construction ----------------------------------------------------

    @property
    def mins_matrix(self) -> np.ndarray:
        """[N, s] rows; pending adds are materialised lazily (appending one
        row at a time would be O(N^2) in copies)."""
        if self._pending:
            self.mins = np.vstack([self.mins] + self._pending)
            self._pending = []
        return self.mins

    def add(self, name: str, sketch_mins: np.ndarray) -> None:
        if sketch_mins.shape[0] != self.sketch_size:
            raise LSHIndexError(
                f"sketch length mismatch: {sketch_mins.shape[0]} vs {self.sketch_size}"
            )
        idx = len(self.names)
        self.names.append(name)
        self._pending.append(sketch_mins.astype(np.uint64)[None, :])
        r = self.band_rows
        for bi in range(self.n_bands):
            key = _band_key(sketch_mins[bi * r : (bi + 1) * r])
            self.buckets[bi].setdefault(key, []).append(idx)

    # ---- query -----------------------------------------------------------

    def candidates(self, query_mins: np.ndarray) -> np.ndarray:
        r = self.band_rows
        cand: set = set()
        for bi in range(self.n_bands):
            key = _band_key(query_mins[bi * r : (bi + 1) * r])
            cand.update(self.buckets[bi].get(key, ()))
        return np.array(sorted(cand), dtype=np.int64)

    def search(self, query_mins: np.ndarray, thresh: float | None = None):
        """-> list of (name, similarity) with sim >= thresh, best first."""
        t = self.jaccard_thresh if thresh is None else thresh
        cand = self.candidates(query_mins)
        if cand.size == 0:
            return []
        sims = (self.mins_matrix[cand] == query_mins[None, :]).mean(axis=1)
        keep = sims >= t
        order = np.argsort(-sims[keep])
        kept = cand[keep][order]
        return [(self.names[i], float(s)) for i, s in zip(kept, sims[keep][order])]

    def search_batch_device(self, query_mins: np.ndarray, thresh: float | None = None):
        """Rank many queries at once with the blocked device kernel; LSH
        candidate prefiltering still prunes per query."""
        from hulk_tpu.ops.distance import pairwise_jaccard_sim
        import jax.numpy as jnp

        t = self.jaccard_thresh if thresh is None else thresh
        q = query_mins.shape[0]
        all_mins = jnp.asarray(
            np.vstack([self.mins_matrix, query_mins.astype(np.uint64)]).astype(np.int64)
        )
        sim = np.asarray(pairwise_jaccard_sim(all_mins))
        n = len(self.names)
        out = []
        for qi in range(q):
            cand = self.candidates(query_mins[qi])
            sims = sim[n + qi, cand] if cand.size else np.empty(0)
            keep = sims >= t
            order = np.argsort(-sims[keep])
            kept = cand[keep][order]
            out.append([(self.names[i], float(s)) for i, s in zip(kept, sims[keep][order])])
        return out

    # ---- serialisation ---------------------------------------------------

    def write_json(self, path: str) -> None:
        doc = {
            "class": "hulk_index",
            "version": HULK_COMPAT_VERSION,
            "ksize": self.kmer_size,
            "sketch_size": self.sketch_size,
            "jaccard_thresh": self.jaccard_thresh,
            "n_bands": self.n_bands,
            "band_rows": self.band_rows,
            "names": self.names,
            "mins": [[int(v) for v in row] for row in self.mins_matrix],
        }
        with open(path, "w") as fh:
            json.dump(doc, fh)

    @classmethod
    def load_json(cls, path: str) -> "LSHForest":
        if not os.path.exists(path):
            raise LSHIndexError(f"file does not exist: {path}")
        with open(path) as fh:
            doc = json.load(fh)
        if doc.get("class") != "hulk_index":
            raise LSHIndexError(f"JSON is not a HULK index: {path}")
        if doc.get("version") != HULK_COMPAT_VERSION:
            raise LSHIndexError(
                f"index was created with a different version of HULK: {doc.get('version')}"
            )
        forest = cls(
            kmer_size=doc["ksize"],
            sketch_size=doc["sketch_size"],
            jaccard_thresh=doc["jaccard_thresh"],
            n_bands=doc["n_bands"],
            band_rows=doc["band_rows"],
        )
        for name, row in zip(doc["names"], doc["mins"]):
            forest.add(name, np.array(row, dtype=np.uint64))
        return forest
