"""Consistent Weighted Sampling tables, bit-identical to the reference.

The reference builds three [sketchSize x dimensions] float64 matrices from two
independent Go-rand streams both seeded DISTRIBUTION_SEED=1
(src/histosketch/histosketch.go:95-126):

    r[i][j] = Gamma(2,1)            # gamma stream draw 2*(i*dims+j)
    c[i][j] = log(Gamma(2,1))       # gamma stream draw 2*(i*dims+j)+1
    b[i][j] = Uniform(0,1) * r[i][j]  # uniform stream draw i*dims+j

Tables are deterministic per (sketch_size, dims) — identical for every run
and sample, which is what makes sketches comparable — so we cache them on
disk. ``exp_r`` (= Go math.Exp of r, needed by the update rule) is cached
alongside; exp is deterministic so precomputing preserves bit-equality.

For k=21 defaults (dims=194481, s=50) the three tables are ~233 MB and take
O(10^8) RNG draws to build; the bulk gamma path does this in seconds-to-
minutes once, then the cache makes it free.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from hulk_tpu.hashes.fdlibm import go_exp, go_log
from hulk_tpu.hashes.gamma import GammaGenerator
from hulk_tpu.hashes.gorand import GoRand

DISTRIBUTION_SEED = 1
_CACHE_VERSION = 1


@dataclass
class CWSTables:
    r: np.ndarray  # [s, dims]
    c: np.ndarray  # [s, dims], log of second gamma draw
    b: np.ndarray  # [s, dims], uniform * r
    exp_r: np.ndarray  # [s, dims], go_exp(r)


def default_cache_dir() -> str:
    return os.environ.get(
        "HULK_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hulk_tpu"),
    )


def _cache_base(sketch_size: int, dims: int) -> str:
    return os.path.join(
        default_cache_dir(), f"cws_v{_CACHE_VERSION}_s{sketch_size}_d{dims}"
    )


def build_cws_tables(sketch_size: int, dims: int) -> CWSTables:
    """Generate the tables from scratch (exact reference draw order).

    Uses the native generator when available (~20x faster; bit-identical —
    cross-validated in tests/test_native.py), falling back to the Python
    replica."""
    from hulk_tpu import native

    nat = native.cws_fill_native(sketch_size, dims) if native.available() else None
    if nat is not None:
        r, c, b, er = nat
        return CWSTables(r=r, c=c, b=b, exp_r=er)
    n_cells = sketch_size * dims
    gammas = GammaGenerator(DISTRIBUTION_SEED).gamma_block(2 * n_cells)
    uniforms = GoRand(DISTRIBUTION_SEED).float64_block(n_cells)
    r = gammas[0::2].reshape(sketch_size, dims)
    c = go_log(gammas[1::2]).reshape(sketch_size, dims)
    # Float64Range(0,1) == 0 + (1-0)*Float64() == Float64() bit-exactly
    b = uniforms.reshape(sketch_size, dims) * r
    return CWSTables(r=r, c=c, b=b, exp_r=go_exp(r))


def get_cws_tables(sketch_size: int, dims: int, cache: bool = True) -> CWSTables:
    """Load-or-build. The cache is one raw .npy per matrix, memory-mapped on
    load: np.load of .npz streams through zipfile at ~13 MB/s (measured 24 s
    for the default tables), while mmap'd .npy costs nothing until pages are
    touched. `r` is only needed at build time (the update rule uses exp_r),
    so it is stored but not loaded on the hot path."""
    base = _cache_base(sketch_size, dims)
    names = ("r", "c", "b", "exp_r")
    if cache and all(os.path.exists(f"{base}.{n}.npy") for n in names):
        c = np.load(f"{base}.c.npy", mmap_mode="r")
        b = np.load(f"{base}.b.npy", mmap_mode="r")
        er = np.load(f"{base}.exp_r.npy", mmap_mode="r")
        r = np.load(f"{base}.r.npy", mmap_mode="r")
        return CWSTables(r=r, c=c, b=b, exp_r=er)
    tables = build_cws_tables(sketch_size, dims)
    if cache:
        os.makedirs(os.path.dirname(base), exist_ok=True)
        for n in names:
            tmp = f"{base}.{n}.tmp{os.getpid()}.npy"
            np.save(tmp, getattr(tables, n if n != "exp_r" else "exp_r"))
            os.replace(tmp, f"{base}.{n}.npy")
    return tables
