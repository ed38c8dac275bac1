"""Tests for the Go math.Exp/Log ports.

Without a Go toolchain the oracle is: (a) agreement with platform libm to
<=1 ULP everywhere (fdlibm is faithfully rounded), (b) exact equality with
libm on the overwhelming majority of inputs, (c) exact special-case and
identity behaviour. Bit-level Go agreement is established by construction
(operation-for-operation port) and cross-checked downstream by sketch-level
fixtures.
"""
import numpy as np

from hulk_tpu.hashes.fdlibm import go_exp, go_log


def ulp_diff(a, b):
    ai = a.view(np.int64) if isinstance(a, np.ndarray) else np.float64(a).view(np.int64)
    bi = b.view(np.int64) if isinstance(b, np.ndarray) else np.float64(b).view(np.int64)
    return np.abs(ai - bi)


def test_exp_matches_libm_within_1ulp():
    rng = np.random.default_rng(0)
    x = rng.uniform(-700, 700, 200_000)
    x = np.concatenate([x, rng.uniform(-1e-5, 1e-5, 10_000)])
    got = go_exp(x)
    ref = np.exp(x)
    d = ulp_diff(got, ref)
    assert d.max() <= 1
    # fdlibm and glibc agree exactly on the large majority of inputs
    assert (d == 0).mean() > 0.85


def test_log_matches_libm_within_1ulp():
    rng = np.random.default_rng(1)
    x = np.concatenate(
        [
            rng.uniform(1e-300, 1e300, 100_000),
            rng.uniform(0, 1, 100_000),
            rng.uniform(0.9, 1.1, 50_000),
        ]
    )
    got = go_log(x)
    ref = np.log(x)
    d = ulp_diff(got, ref)
    assert d.max() <= 1
    assert (d == 0).mean() > 0.9


def test_known_values():
    assert go_exp(0.0) == 1.0
    assert go_exp(1.0) == 2.718281828459045
    assert go_log(1.0) == 0.0
    assert go_log(2.0) == 0.6931471805599453
    assert go_log(4.0) == 1.3862943611198906
    # exp/log round trip at representative magnitudes
    for v in [1e-6, 0.5, 1.0, 3.14159, 100.0]:
        assert abs(go_exp(go_log(v)) / v - 1) < 1e-15


def test_special_cases():
    assert go_exp(np.inf) == np.inf
    assert go_exp(-np.inf) == 0.0
    assert np.isnan(go_exp(np.nan))
    assert go_exp(710.0) == np.inf
    assert go_exp(-746.0) == 0.0
    assert go_exp(1e-9) == 1.0 + 1e-9  # NearZero branch
    assert go_log(0.0) == -np.inf
    assert np.isnan(go_log(-1.0))
    assert go_log(np.inf) == np.inf


def test_scalar_and_array_agree():
    xs = np.array([0.25, 1.75, -3.5, 42.0])
    assert np.array_equal(go_exp(xs), np.array([go_exp(float(v)) for v in xs]))
    ys = np.abs(xs)
    assert np.array_equal(go_log(ys), np.array([go_log(float(v)) for v in ys]))
