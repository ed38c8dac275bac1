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

# Smallest normal f64. Decay multiplies squash subnormal results to +0 —
# output-equivalent to keeping them (a subnormal counter is only ever read
# through a +freq increment with freq >= 1, where it rounds away, or decayed
# further toward the same +0) and ~40x fewer microcode traps; the native
# flush applies the identical squash via FTZ (hulkrt.cpp, proof there).
_TINY = float(np.finfo(np.float64).tiny)


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


_row_bins_table_cache: dict = {}


def cms_row_bins_table(nbins: int, depth: int, width: int) -> np.ndarray:
    """[depth, nbins] row positions for every spectrum bin id.

    Spectrum bin ids are the only CMS elements in the pipeline and nbins is
    fixed per run, so the whole table is computed once (and persisted beside
    the CWS cache) instead of re-hashing on every flush."""
    key = (nbins, depth, width)
    if key in _row_bins_table_cache:
        return _row_bins_table_cache[key]
    import os

    from hulk_tpu.hashes.cws import default_cache_dir

    path = os.path.join(default_cache_dir(), f"cmsrows_n{nbins}_d{depth}_w{width}.npy")
    if os.path.exists(path):
        tab = np.load(path)
    else:
        tab = cms_row_bins(np.arange(nbins, dtype=np.uint64), depth, width)
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}.npy"
            np.save(tmp, tab)
            os.replace(tmp, path)
        except OSError:
            pass
    _row_bins_table_cache[key] = tab
    return tab


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
            self.sketch[self.sketch < _TINY] = 0.0
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
        Returns the post-increment minima [n]. The scan is sequential because
        estimates depend on prior elements via counter collisions
        (see SURVEY.md §3.4); it runs as a jitted lax.scan pinned to the CPU
        backend (f64 there is IEEE, so the counter arithmetic is bit-equal to
        the pure-NumPy loop, which remains below as the test oracle).
        """
        q, out = _cms_scan_jax(
            self.sketch, row_bins, increments.astype(np.float64),
            self.decay_weight if self.apply_scaling else 0.0, self.apply_scaling,
            self.depth,
        )
        self.sketch = np.asarray(q)
        return np.asarray(out)

    def add_many_reference(self, row_bins: np.ndarray, increments: np.ndarray) -> np.ndarray:
        """Pure-NumPy sequential oracle for add_many (used by tests)."""
        n = increments.shape[0]
        out = np.empty(n, dtype=np.float64)
        rows = np.arange(self.depth)
        q = self.sketch
        decay = self.decay_weight
        scaling = self.apply_scaling
        for i in range(n):
            if scaling:
                q *= decay
                q[q < _TINY] = 0.0
            cols = row_bins[:, i]
            q[rows, cols] += increments[i]
            out[i] = q[rows, cols].min()
        return out


def _next_bucket(n: int) -> int:
    b = 1024
    while b < n:
        b *= 2
    return b


def _cms_scan_jax(sketch, row_bins, increments, decay_weight, scaling, depth):
    """Run the sequential CMS scan under jit on the CPU backend."""
    import jax
    import jax.numpy as jnp

    n = increments.shape[0]
    m = _next_bucket(n)
    rb = np.zeros((m, row_bins.shape[0]), dtype=np.int32)
    rb[:n] = row_bins.T
    inc = np.zeros(m, dtype=np.float64)
    inc[:n] = increments

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out_q, out_e = _cms_scan_compiled(depth, scaling)(
            jnp.asarray(sketch), jnp.asarray(rb), jnp.asarray(inc),
            jnp.float64(decay_weight),
        )
    return out_q, np.asarray(out_e)[:n]


_cms_scan_fns: dict = {}


def _cms_scan_compiled(depth: int, scaling: bool):
    key = (depth, scaling)
    if key in _cms_scan_fns:
        return _cms_scan_fns[key]
    import jax
    import jax.numpy as jnp

    rows = np.arange(depth)

    @jax.jit
    def run(q, rb, inc, dw):
        def body(q, xs):
            cols, f = xs
            live = f != 0.0
            if scaling:
                qs = q * dw
                qs = jnp.where(qs >= _TINY, qs, 0.0)  # subnormal squash
                q = jnp.where(live, qs, q)
            q = q.at[rows, cols].add(jnp.where(live, f, 0.0))
            esti = q[rows, cols].min()
            return q, esti

        q, estis = jax.lax.scan(body, q, (rb, inc))
        return q, estis

    _cms_scan_fns[key] = run
    return run
