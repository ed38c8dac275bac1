"""Gamma replica and CWS table tests: scalar/bulk stream equality,
distribution sanity, table layout and caching."""
import numpy as np
import pytest

from hulk_tpu.hashes.cws import build_cws_tables, get_cws_tables
from hulk_tpu.hashes.fdlibm import go_exp, go_log
from hulk_tpu.hashes.gamma import GammaGenerator


def test_bulk_matches_scalar():
    n = 5000
    a = GammaGenerator(1)
    scalar = np.array([a.gamma(2, 1) for _ in range(n)])
    b = GammaGenerator(1)
    bulk = b.gamma_block(n)
    assert np.array_equal(scalar, bulk)


def test_bulk_matches_scalar_across_chunk_boundary(monkeypatch):
    import hulk_tpu.hashes.gamma as g

    monkeypatch.setattr(g, "_CHUNK", 97)  # force many refills
    n = 2000
    scalar_gen = GammaGenerator(1)
    scalar = np.array([scalar_gen.gamma(2, 1) for _ in range(n)])
    bulk = GammaGenerator(1).gamma_block(n)
    assert np.array_equal(scalar, bulk)


def test_gamma_distribution_moments():
    x = GammaGenerator(7).gamma_block(200_000)
    # Gamma(2,1): mean 2, var 2
    assert abs(x.mean() - 2.0) < 0.02
    assert abs(x.var() - 2.0) < 0.05
    assert (x > 0).all()


def test_invalid_params():
    g = GammaGenerator(1)
    with pytest.raises(ValueError):
        g.gamma(0, 1)
    with pytest.raises(ValueError):
        g.gamma(2, -1)


def test_cws_layout_and_determinism():
    t1 = build_cws_tables(3, 64)
    t2 = build_cws_tables(3, 64)
    for a, b in [(t1.r, t2.r), (t1.c, t2.c), (t1.b, t2.b)]:
        assert np.array_equal(a, b)
    assert t1.r.shape == (3, 64)
    # draw-order: r[0,0] is the first gamma draw; c[0,0] log of the second
    g = GammaGenerator(1)
    first, second = g.gamma(2, 1), g.gamma(2, 1)
    assert t1.r[0, 0] == first
    assert t1.c[0, 0] == go_log(second)
    # b = uniform*r with the uniform stream independent (seed 1 again)
    from hulk_tpu.hashes.gorand import GoRand

    u0 = GoRand(1).float64()
    assert t1.b[0, 0] == u0 * first
    assert np.array_equal(t1.exp_r, go_exp(t1.r))


def test_cws_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("HULK_TPU_CACHE", str(tmp_path))
    a = get_cws_tables(2, 32)
    b = get_cws_tables(2, 32)  # from cache
    assert np.array_equal(a.r, b.r) and np.array_equal(a.b, b.b)
    assert len(list(tmp_path.iterdir())) == 4  # one .npy per matrix
