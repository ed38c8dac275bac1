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


def _cache_path(sketch_size: int, dims: int) -> str:
    return os.path.join(
        default_cache_dir(), f"cws_v{_CACHE_VERSION}_s{sketch_size}_d{dims}.npz"
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
    path = _cache_path(sketch_size, dims)
    if cache and os.path.exists(path):
        z = np.load(path)
        return CWSTables(r=z["r"], c=z["c"], b=z["b"], exp_r=z["exp_r"])
    tables = build_cws_tables(sketch_size, dims)
    if cache:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npz"  # np.savez appends .npz otherwise
        np.savez(tmp, r=tables.r, c=tables.c, b=tables.b, exp_r=tables.exp_r)
        os.replace(tmp, path)
    return tables
