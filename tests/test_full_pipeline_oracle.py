"""END-TO-END Go-equality: the production pipeline (host path and the
grouped device-stream path) vs the literal straight-line transcription of
the reference composition (tests/oracle_pipeline.py), across both decay
modes and interval flushing. Bitwise equality on the histosketch mins AND
weights closes the composition gap left by per-module differential tests:
if any module boundary (spectrum dump order, CMS scaling order, drift
handling, flush timing) deviated from the Go wiring, the float64 weights
would diverge in the low bits.
"""
import numpy as np
import pytest

from hulk_tpu.hashes.cws import build_cws_tables
from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline
from tests.oracle_pipeline import oracle_sketch_pipeline

K, W, S = 11, 5, 8
DIMS = K ** 4  # 14641


@pytest.fixture(scope="module")
def tables():
    return build_cws_tables(S, DIMS)


@pytest.fixture(scope="module")
def reads():
    rng = np.random.default_rng(99)
    out = []
    for _ in range(240):
        n = int(rng.integers(K + W - 1, 140))
        bases = rng.choice(list(b"ACGTN"), size=n, p=[0.2425] * 4 + [0.03])
        out.append(bytes(bases.tolist()))
    return out


def run_production(reads, tables, *, decay, interval, device):
    cfg = SketchConfig(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=DIMS,
        decay_ratio=decay, interval=interval, device_stream=device,
        batch_size=32, data_parallel=False,
    )
    import hulk_tpu.sketch.histosketch as hsmod

    orig = hsmod.get_cws_tables
    hsmod.get_cws_tables = lambda s, d: tables
    try:
        res = run_sketch_pipeline(iter(reads), cfg)
    finally:
        hsmod.get_cws_tables = orig
    hs = res.hulk_data.signatures[0][1]
    return (
        np.asarray(hs.sketch, dtype=np.uint64),
        np.asarray(hs.sketch_weights, dtype=np.float64),
        res.minimizer_count,
    )


@pytest.mark.parametrize(
    "decay,interval",
    [(1.0, 0), (1.0, 60), (0.2, 60)],
    ids=["no-drift", "no-drift-interval", "drift-interval"],
)
def test_production_equals_literal_oracle(reads, tables, decay, interval):
    o_sketch, o_weights, o_count = oracle_sketch_pipeline(
        reads, k=K, w=W, sketch_size=S, nbins=DIMS, decay_ratio=decay,
        interval=interval, tables=tables,
    )
    for device in (False, True):
        sketch, weights, count = run_production(
            reads, tables, decay=decay, interval=interval, device=device
        )
        assert count == o_count, f"minimizer count (device={device})"
        assert np.array_equal(sketch, np.asarray(o_sketch, dtype=np.uint64)), (
            f"sketch mins (device={device})"
        )
        # bitwise float equality, not approx: any wiring deviation shows here
        assert np.array_equal(
            weights.view(np.uint64),
            np.asarray(o_weights, dtype=np.float64).view(np.uint64),
        ), f"sketch weights (device={device})"


@pytest.mark.parametrize("interval", [0, 7])
def test_mixed_length_bucket_churn_matches_oracle(tables, interval):
    """Reads spread across many length buckets in shuffled order: every
    bucket switch flushes the staged transfer group mid-stream, and the
    interval (not aligned to batch or group sizes) must still cut at exact
    global read indices."""
    rng = np.random.default_rng(17)
    reads = []
    for _ in range(90):
        n = int(rng.choice([K + W - 1, 40, 120, 130, 200, 300, 600, 1100]))
        bases = rng.choice(list(b"ACGTN"), size=n, p=[0.2425] * 4 + [0.03])
        reads.append(bytes(bases.tolist()))
    got_m, got_w, got_c = run_production(
        reads, tables, decay=0.9, interval=interval, device=True
    )
    want_m, want_w, want_c = oracle_sketch_pipeline(
        reads, k=K, w=W, sketch_size=S, nbins=DIMS, decay_ratio=0.9,
        interval=interval, tables=tables,
    )
    assert got_c == want_c
    np.testing.assert_array_equal(got_m, np.array(want_m, dtype=np.uint64))
    np.testing.assert_array_equal(got_w, np.array(want_w))
