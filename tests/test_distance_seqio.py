"""Batched distance kernels vs scalar host path; seqio utilities."""
import numpy as np

from hulk_tpu.ops.distance import pairwise_jaccard_sim, pairwise_weighted_jaccard_dist
from hulk_tpu.sketch.distances import get_distance, get_wjd
from hulk_tpu.stream.seqio import base_check, quality_trim, reverse_complement


def test_pairwise_jaccard_matches_scalar():
    rng = np.random.default_rng(0)
    mins = rng.integers(0, 50, (37, 42), dtype=np.int64)
    sim = np.asarray(pairwise_jaccard_sim(mins))
    for i in range(0, 37, 7):
        for j in range(0, 37, 5):
            d = get_distance(mins[i].astype(np.float64), mins[j].astype(np.float64), "jaccard")
            assert abs((1.0 - sim[i, j]) - d) < 1e-12


def test_pairwise_wjd_matches_scalar_with_subject_bug():
    from hulk_tpu.ops.distance import wjd_recheck_margin

    rng = np.random.default_rng(1)
    mins = rng.integers(0, 30, (23, 42), dtype=np.int64)
    weights = rng.uniform(0.01, 5.0, (23, 42))
    dm = np.asarray(pairwise_weighted_jaccard_dist(mins, weights))
    for i in range(0, 23, 3):
        for j in range(0, 23, 4):
            # host path with BOTH weight vectors from the subject (row i)
            d = get_wjd(
                mins[i].astype(np.float64), mins[j].astype(np.float64),
                weights[i], weights[i],
            )
            # f64-scan + single-f32-cast device kernel: error provably
            # inside the recheck margin (the CLI re-checks boundary cells)
            assert abs(dm[i, j] - d) < wjd_recheck_margin(42)
    assert np.allclose(np.diag(dm), 0.0)


def test_pairwise_wjd_margin_holds_at_extreme_magnitudes():
    """The recheck-margin proof relies on row normalization: weights
    spanning f32-overflow/underflow magnitudes must still land inside the
    margin (raw Akas can exceed f32 range)."""
    from hulk_tpu.ops.distance import wjd_recheck_margin

    rng = np.random.default_rng(5)
    s = 512  # big sketches stress the s-independence of the margin bound
    mins = rng.integers(0, 6, (17, s), dtype=np.int64)
    weights = 10.0 ** rng.uniform(-60, 60, (17, s))
    dm = np.asarray(pairwise_weighted_jaccard_dist(mins, weights))
    worst = 0.0
    for i in range(17):
        for j in range(17):
            d = get_wjd(
                mins[i].astype(np.float64), mins[j].astype(np.float64),
                weights[i], weights[i],
            )
            worst = max(worst, abs(dm[i, j] - d))
    assert worst < wjd_recheck_margin(s), worst


def test_pairwise_block_boundary():
    rng = np.random.default_rng(2)
    mins = rng.integers(0, 10, (1030, 16), dtype=np.int64)
    sim = np.asarray(pairwise_jaccard_sim(mins, block=512))
    assert sim.shape == (1030, 1030)
    assert np.allclose(np.diag(sim), 1.0)


def test_base_check():
    assert base_check(b"acgtn") == b"ACGTN"
    assert base_check(b"AXGZ.") == b"ANGNN"


def test_reverse_complement():
    assert reverse_complement(b"ACGTN") == b"NACGT"
    assert reverse_complement(reverse_complement(b"GATTACA")) == b"GATTACA"


def test_quality_trim():
    seq = b"ACGTACGTAC"
    hi, lo = chr(33 + 40).encode(), chr(33 + 2).encode()
    qual = hi * 6 + lo * 4  # low-quality tail
    s, q = quality_trim(seq, qual, 20)
    assert s == seq[:6] and q == qual[:6]
    s2, q2 = quality_trim(seq, hi * 10, 20)
    assert s2 == seq  # nothing trimmed
