"""Sharding tests on the virtual 8-device CPU mesh: shard-count invariance of
the histogram (psum merge is exact) and the sharded flush vs the host flush."""
import jax
import numpy as np
import pytest

from hulk_tpu.hashes.cws import build_cws_tables
from hulk_tpu.ops.encode import pack_reads
from hulk_tpu.parallel.mesh import (
    make_sketch_mesh,
    shard_tables,
    sharded_flush_step,
    sharded_histogram_step,
)
from hulk_tpu.sketch.countmin import cms_shape
from hulk_tpu.sketch.histosketch import HistoSketch
from hulk_tpu.sketch.spectrum import KmerSpectrum

K, W, S = 9, 5, 8
NBINS = K ** 4

RNG = np.random.default_rng(11)


def mkbatch(r=64, l=96):
    seqs = [bytes(RNG.choice(list(b"ACGT"), size=l).tolist()) for _ in range(r)]
    return pack_reads(seqs, pad_to=l, n_reads=r), seqs


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_histogram_matches_host():
    packed, seqs = mkbatch(64)
    mesh = make_sketch_mesh(n_dp=8, n_mp=1)
    step = sharded_histogram_step(mesh, NBINS, K, W)
    hist, count = step(packed.codes, packed.lengths)
    hist = np.asarray(hist).astype(np.float64)

    host = KmerSpectrum(NBINS)
    from hulk_tpu.ops.minimizer import minimizer_scan

    vals, mask = minimizer_scan(packed.codes, packed.lengths, k=K, w=W)
    host.add_hashes(np.asarray(vals)[np.asarray(mask)])
    assert np.array_equal(hist, host.bins)
    assert int(count) == int(np.asarray(mask).sum())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_mp_mesh_flush_close_to_host():
    """Parallel device flush vs exact host flush, composing across two
    interval flushes via the CMS carry."""
    import jax.numpy as jnp

    from hulk_tpu.sketch.countmin import cms_row_bins_table

    mesh = make_sketch_mesh(n_dp=4, n_mp=2)
    step = sharded_histogram_step(mesh, NBINS, K, W)
    tables = build_cws_tables(S, NBINS)
    depth, width = cms_shape()
    flush = sharded_flush_step(mesh, 0.0, False, depth, width)
    c_sh, b_sh, er_sh = shard_tables(mesh, tables)
    row_bins = jnp.asarray(cms_row_bins_table(NBINS, depth, width))

    sk = jnp.zeros(S, dtype=jnp.int64)
    wts = jnp.full(S, np.finfo(np.float64).max)
    cms = jnp.zeros((depth, width), dtype=jnp.float64)
    host = HistoSketch(K, S, NBINS, 1.0, tables=tables)

    for round_ in range(2):  # two interval flushes: CMS must carry across
        packed, _ = mkbatch(64)
        hist, _ = step(packed.codes, packed.lengths)
        cms, sk, wts = flush(hist, row_bins, cms, sk, wts, c_sh, b_sh, er_sh)
        ids = np.nonzero(np.asarray(hist))[0].astype(np.int64)
        host.add_elements(ids, np.asarray(hist).astype(np.float64)[ids])

    # device flush uses XLA exp/log: bin choices must agree, weights ~1 ULP,
    # CMS counters exactly (integer sums)
    assert np.array_equal(np.asarray(sk, dtype=np.uint64), host.sketch)
    np.testing.assert_allclose(np.asarray(wts), host.sketch_weights, rtol=1e-12)
    assert np.array_equal(np.asarray(cms), host.cms.sketch)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_flush_drift_matches_host():
    import jax.numpy as jnp

    from hulk_tpu.hashes.fdlibm import go_exp
    from hulk_tpu.sketch.countmin import cms_row_bins_table

    mesh = make_sketch_mesh(n_dp=4, n_mp=2)
    step = sharded_histogram_step(mesh, NBINS, K, W)
    tables = build_cws_tables(S, NBINS)
    depth, width = cms_shape()
    decay = 0.9
    dw = float(go_exp(-decay))
    flush = sharded_flush_step(mesh, dw, True, depth, width)
    c_sh, b_sh, er_sh = shard_tables(mesh, tables)
    row_bins = jnp.asarray(cms_row_bins_table(NBINS, depth, width))

    packed, _ = mkbatch(64)
    hist, _ = step(packed.codes, packed.lengths)
    sk = jnp.zeros(S, dtype=jnp.int64)
    wts = jnp.full(S, np.finfo(np.float64).max)
    cms = jnp.zeros((depth, width), dtype=jnp.float64)
    cms, sk, wts = flush(hist, row_bins, cms, sk, wts, c_sh, b_sh, er_sh)

    host = HistoSketch(K, S, NBINS, decay, tables=tables)
    ids = np.nonzero(np.asarray(hist))[0].astype(np.int64)
    host.add_elements(ids, np.asarray(hist).astype(np.float64)[ids])
    assert np.array_equal(np.asarray(sk, dtype=np.uint64), host.sketch)
    np.testing.assert_allclose(np.asarray(wts), host.sketch_weights, rtol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_flush_corpus_sweep_csv_precision():
    """The exactness decision's evidence (mesh.py docstring): across a corpus
    of random flushes, the device flush must pick identical sketch bins and
    weights that round identically at the smash CSV's %.2f precision."""
    import jax.numpy as jnp

    from hulk_tpu.sketch.countmin import cms_row_bins_table

    mesh = make_sketch_mesh(n_dp=8, n_mp=1)
    tables = build_cws_tables(S, NBINS)
    depth, width = cms_shape()
    flush = sharded_flush_step(mesh, 0.0, False, depth, width)
    c_sh, b_sh, er_sh = shard_tables(mesh, tables)
    row_bins = jnp.asarray(cms_row_bins_table(NBINS, depth, width))

    for seed in range(6):
        r = np.random.default_rng(seed)
        hist = np.zeros(NBINS, dtype=np.int32)
        ids = r.choice(NBINS, NBINS // 12, replace=False)
        hist[ids] = r.integers(1, 300, ids.shape[0])
        sk = jnp.zeros(S, dtype=jnp.int64)
        wts = jnp.full(S, np.finfo(np.float64).max)
        cms = jnp.zeros((depth, width), dtype=jnp.float64)
        cms, sk, wts = flush(jnp.asarray(hist), row_bins, cms, sk, wts, c_sh, b_sh, er_sh)

        host = HistoSketch(K, S, NBINS, 1.0, tables=tables)
        nz = np.nonzero(hist)[0].astype(np.int64)
        host.add_elements(nz, hist.astype(np.float64)[nz])
        assert np.array_equal(np.asarray(sk, dtype=np.uint64), host.sketch), seed
        # weights agree beyond CSV precision (smash cells print %.2f)
        np.testing.assert_allclose(np.asarray(wts), host.sketch_weights, rtol=1e-12)


def test_compact_stream_step_matches_host():
    import jax.numpy as jnp

    from hulk_tpu.ops.device_step import (
        bin_scatter_slice,
        live_bucket,
        minimizer_sorted_flat,
    )
    from hulk_tpu.ops.minimizer import minimizer_scan

    packed, _ = mkbatch(32, 96)
    svals, cnt = minimizer_sorted_flat(packed.codes, packed.lengths, k=K, w=W)
    b = live_bucket(int(cnt), 32 * 96, 32)
    hist = bin_scatter_slice(jnp.zeros(NBINS, dtype=jnp.int32), svals[:b])

    host = KmerSpectrum(NBINS)
    vals, mask = minimizer_scan(packed.codes, packed.lengths, k=K, w=W)
    host.add_hashes(np.asarray(vals)[np.asarray(mask)])
    assert np.array_equal(np.asarray(hist).astype(np.float64), host.bins)
    assert int(cnt) == int(np.asarray(mask).sum())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_sharded_pipeline_matches_unsharded():
    """The production data-parallel stream (what `hulk sketch` runs when >1
    device is visible): 8-way dp-sharded output must be bit-identical to the
    single-device path, including the secondary sketches."""
    import gzip
    import os

    from hulk_tpu.stream.fastq import batch_reads, stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    if not os.path.exists(fixture):
        pytest.skip("fixture missing")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, kmv=True, khf=True, hmh=True)
    r1 = run_sketch_pipeline(
        stream_reads([fixture]), SketchConfig(**kw, device_stream=False)
    )
    r2 = run_sketch_pipeline(
        stream_reads([fixture]),
        SketchConfig(**kw, device_stream=True, data_parallel=True, batch_size=256),
    )
    s1 = dict(r1.hulk_data.signatures)
    s2 = dict(r2.hulk_data.signatures)
    assert r1.minimizer_count == r2.minimizer_count
    for algo in ("histosketch", "kmv", "khf", "hyperminhash"):
        assert np.array_equal(s1[algo].get_sketch(), s2[algo].get_sketch()), algo
    assert np.array_equal(s1["histosketch"].sketch_weights, s2["histosketch"].sketch_weights)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_sharded_pipeline_interval_flushes():
    """Interval flushes on the dp-sharded stream land at the same global read
    indices and give the same result as the unsharded host path."""
    import os

    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    if not os.path.exists(fixture):
        pytest.skip("fixture missing")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, interval=250)
    r1 = run_sketch_pipeline(
        stream_reads([fixture]), SketchConfig(**kw, device_stream=False)
    )
    r2 = run_sketch_pipeline(
        stream_reads([fixture]),
        SketchConfig(**kw, device_stream=True, data_parallel=True, batch_size=128),
    )
    h1 = dict(r1.hulk_data.signatures)["histosketch"]
    h2 = dict(r2.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.get_sketch(), h2.get_sketch())
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)


def test_sharded_smash_matches_single_device():
    """Row-sharded weighted-Jaccard matrix over the 8-device mesh must be
    BIT-identical to the single-device blocked kernel (same body, sharding
    only partitions the row batch), including the row-slice entry point."""
    import numpy as np

    from hulk_tpu.ops.distance import pairwise_weighted_jaccard_dist
    from hulk_tpu.parallel.smash import sharded_pairwise_wjd, sharded_wjd_rows

    rng = np.random.default_rng(41)
    n, s = 100, 42
    mins = rng.integers(0, 1 << 40, (n, s), dtype=np.int64)
    # duplicate some slots across rows so intersections are non-trivial
    mins[1::3, :10] = mins[0, :10]
    weights = rng.random((n, s)) * 1e-3
    ref = np.asarray(pairwise_weighted_jaccard_dist(mins, weights))
    shd = sharded_pairwise_wjd(mins, weights, ndev=8, block=16)
    assert np.array_equal(ref, shd)

    rows = sharded_wjd_rows(mins, weights, 37, 71, ndev=8, block=16)
    assert np.array_equal(ref[37:71], rows)


def test_sharded_raw_file_input_matches_host(tmp_path):
    """File input + data_parallel engages the RawReads lane through the
    grouped sharded step (per-shard flat v2 buffers); output must equal the
    exact host path bit-for-bit, including secondary sketches."""
    import numpy as np

    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    rng = np.random.default_rng(31)
    f = tmp_path / "reads.fq"
    with open(f, "wb") as fh:
        for i in range(700):
            n = int(rng.integers(60, 151))
            seq = bytes(rng.choice(list(b"ACGTN"), p=[0.24] * 4 + [0.04], size=n).tolist())
            fh.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * n + b"\n")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, kmv=True, khf=True, hmh=True)
    r_host = run_sketch_pipeline(
        stream_reads([str(f)]), SketchConfig(**kw, device_stream=False)
    )
    r_dp = run_sketch_pipeline(
        None,
        SketchConfig(**kw, device_stream=True, data_parallel=True,
                     batch_size=64, input_paths=[str(f)]),
    )
    for name, sig in r_host.hulk_data.signatures:
        other = dict(r_dp.hulk_data.signatures)[name]
        assert np.array_equal(sig.get_sketch(), other.get_sketch()), name
    h1 = dict(r_host.hulk_data.signatures)["histosketch"]
    h2 = dict(r_dp.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)
    assert r_host.minimizer_count == r_dp.minimizer_count
    assert r_host.seq_count == r_dp.seq_count
