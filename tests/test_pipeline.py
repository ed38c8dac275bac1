"""End-to-end pipeline differential test at small scale: the full vectorised
pipeline (minimizer -> jump binning -> spectrum -> histosketch flush) vs a
literal composition of the scalar oracles, plus interval-flush semantics."""
import numpy as np
import pytest

from hulk_tpu.hashes.cws import build_cws_tables
from hulk_tpu.sketch.histosketch import HistoSketch
from hulk_tpu.stream.pipeline import PipelineError, SketchConfig, run_sketch_pipeline
from tests.oracle_minimizer import minimizers_of
from tests.test_hashes import jump_scalar

K, W, S = 11, 5, 8
DIMS = K ** 4  # 14641

RNG = np.random.default_rng(7)


def mkreads(n, length=120):
    return [bytes(RNG.choice(list(b"ACGT"), size=length).tolist()) for _ in range(n)]


def oracle_spectrum(reads, nbins):
    bins = np.zeros(nbins)
    count = 0
    for r in reads:
        for m in minimizers_of(r, K, W):
            bins[jump_scalar(m, nbins)] += 1
            count += 1
    return bins, count


@pytest.fixture(scope="module")
def tables():
    return build_cws_tables(S, DIMS)


def run_cfg(reads, tables, **kw):
    cfg = SketchConfig(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=DIMS, **kw
    )
    import hulk_tpu.sketch.histosketch as hsmod

    orig = hsmod.get_cws_tables
    hsmod.get_cws_tables = lambda s, d: tables
    try:
        return run_sketch_pipeline(iter(reads), cfg)
    finally:
        hsmod.get_cws_tables = orig


def test_pipeline_matches_oracle(tables):
    reads = mkreads(200)
    res = run_cfg(reads, tables, kmv=True, khf=True)
    bins, count = oracle_spectrum(reads, DIMS)
    assert res.minimizer_count == count
    assert res.seq_count == 200

    # oracle histosketch from the oracle spectrum
    ids = np.nonzero(bins)[0].astype(np.int64)
    hs = HistoSketch(K, S, DIMS, 1.0, tables=tables)
    hs.add_elements(ids, bins[ids])

    got_hs = dict(res.hulk_data.signatures)["histosketch"]
    assert np.array_equal(got_hs.get_sketch(), hs.get_sketch())
    assert np.array_equal(got_hs.sketch_weights, hs.sketch_weights)

    # KMV = bottom-k of all per-read-distinct minimizer values
    allvals = []
    for r in reads:
        allvals.extend(minimizers_of(r, K, W))
    exp_kmv = np.sort(np.array(allvals, dtype=np.uint64))[:S]
    got_kmv = dict(res.hulk_data.signatures)["kmv"]
    assert np.array_equal(got_kmv.get_sketch(), exp_kmv)


def test_interval_flush_differs_and_is_batch_invariant(tables):
    reads = mkreads(100)
    r1 = run_cfg(reads, tables, interval=30)
    r2 = run_cfg(reads, tables, interval=30, batch_size=7)
    h1 = dict(r1.hulk_data.signatures)["histosketch"]
    h2 = dict(r2.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.get_sketch(), h2.get_sketch())
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)

    # oracle: three interval flushes (30/30/30) + final partial (10)
    hs = HistoSketch(K, S, DIMS, 1.0, tables=tables)
    for chunk in (reads[0:30], reads[30:60], reads[60:90], reads[90:100]):
        bins, _ = oracle_spectrum(chunk, DIMS)
        ids = np.nonzero(bins)[0].astype(np.int64)
        hs.add_elements(ids, bins[ids])
    assert np.array_equal(h1.get_sketch(), hs.get_sketch())
    assert np.array_equal(h1.sketch_weights, hs.sketch_weights)

    # no-interval run gives a different sketch (single final histogram)
    r0 = run_cfg(reads, tables)
    h0 = dict(r0.hulk_data.signatures)["histosketch"]
    assert not np.array_equal(h0.sketch_weights, h1.sketch_weights)


def test_short_read_fatal(tables):
    reads = [b"ACGTACGT"]  # < w+k-1
    with pytest.raises(PipelineError, match="length"):
        run_cfg(reads, tables)


def test_no_reads_fatal(tables):
    with pytest.raises(PipelineError, match="no sequences"):
        run_cfg([], tables)


def test_streaming_with_drift_matches_oracle(tables):
    """BASELINE config 4 shape at test scale: interval flushes + concept
    drift; result must equal chunked oracle flushes with the CMS state
    carried across intervals."""
    reads = mkreads(90)
    r1 = run_cfg(reads, tables, interval=30, decay_ratio=0.8)
    h1 = dict(r1.hulk_data.signatures)["histosketch"]

    hs = HistoSketch(K, S, DIMS, 0.8, tables=tables)
    for chunk in (reads[0:30], reads[30:60], reads[60:90]):
        bins, _ = oracle_spectrum(chunk, DIMS)
        ids = np.nonzero(bins)[0].astype(np.int64)
        hs.add_elements(ids, bins[ids])
    assert np.array_equal(h1.get_sketch(), hs.get_sketch())
    assert np.array_equal(h1.sketch_weights, hs.sketch_weights)
    assert bool(h1.apply_concept_drift) is True


def test_device_stream_matches_host_path(tables):
    """The device-resident stream (forced on, CPU backend) must produce
    bit-identical sketches to the host path, including KMV/KHF/HMH."""
    reads = mkreads(150)
    r_host = run_cfg(reads, tables, kmv=True, khf=True, hmh=True,
                     device_stream=False)
    r_dev = run_cfg(reads, tables, kmv=True, khf=True, hmh=True,
                    device_stream=True, batch_size=64)
    assert r_host.minimizer_count == r_dev.minimizer_count
    for algo in ("histosketch", "kmv", "khf", "hyperminhash"):
        a = dict(r_host.hulk_data.signatures)[algo]
        b = dict(r_dev.hulk_data.signatures)[algo]
        assert np.array_equal(a.get_sketch(), b.get_sketch()), algo
    ah = dict(r_host.hulk_data.signatures)["histosketch"]
    bh = dict(r_dev.hulk_data.signatures)["histosketch"]
    assert np.array_equal(ah.sketch_weights, bh.sketch_weights)


def test_device_stream_interval_matches(tables):
    reads = mkreads(100)
    r_host = run_cfg(reads, tables, interval=30, device_stream=False)
    r_dev = run_cfg(reads, tables, interval=30, device_stream=True, batch_size=16)
    a = dict(r_host.hulk_data.signatures)["histosketch"]
    b = dict(r_dev.hulk_data.signatures)["histosketch"]
    assert np.array_equal(a.get_sketch(), b.get_sketch())
    assert np.array_equal(a.sketch_weights, b.sketch_weights)


def test_fused_stream_step_matches_two_sort():
    """The single-sort fused step must produce a bit-identical histogram and
    minimizer count to the two-sort step, and its distinct-value stream must
    be the same multiset (read-grouped vs value-sorted order)."""
    import jax.numpy as jnp
    import numpy as np

    from hulk_tpu.ops.device_step import (
        fused_bits_ok,
        sketch_stream_step,
        sketch_stream_step_fused,
        stream_bucket,
    )
    from hulk_tpu.ops.encode import pack_reads

    rng = np.random.default_rng(21)
    K, W, NBINS = 11, 9, 11 ** 4
    assert fused_bits_ok(K, 64)
    for trial in range(3):
        seqs = []
        for _ in range(64):
            n = int(rng.integers(K + W - 1, 160))
            frac = [0.0, 0.2, 1.0][trial] if trial else 0.0
            bases = rng.choice(list(b"ACGTN"), size=n,
                               p=[(1 - frac) / 4] * 4 + [frac])
            seqs.append(bytes(bases.tolist()))
        packed = pack_reads(seqs, pad_to=160, n_reads=64)
        bucket = stream_bucket(64, 64 * 160)
        h0 = jnp.zeros(NBINS, dtype=jnp.int32)
        c0 = jnp.zeros((), dtype=jnp.int64)
        h1, c1, sv1 = sketch_stream_step(
            h0, c0, packed.codes, packed.lengths, k=K, w=W, bucket=bucket
        )
        h0 = jnp.zeros(NBINS, dtype=jnp.int32)
        c0 = jnp.zeros((), dtype=jnp.int64)
        h2, c2, sv2 = sketch_stream_step_fused(
            h0, c0, packed.codes, packed.lengths, k=K, w=W, bucket=bucket
        )
        assert np.array_equal(np.asarray(h1), np.asarray(h2)), trial
        assert int(c1) == int(c2)
        U = np.uint64(0xFFFFFFFFFFFFFFFF)
        a = np.asarray(sv1); a = np.sort(a[a != U])
        b = np.asarray(sv2); b = np.sort(b[b != U])
        assert np.array_equal(a, b)


def test_checkpoint_resume_bit_identical(tmp_path):
    """A run resumed from the interval-2 checkpoint must produce exactly the
    sketch of the uninterrupted run — all state (histosketch, CMS, counters,
    secondary sketches) round-trips. Covers host and device-code paths."""
    import os

    import numpy as np

    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    if not os.path.exists(fixture):
        import pytest

        pytest.skip("fixture missing")
    ck = str(tmp_path / "state.npz")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, interval=250, kmv=True, khf=True,
              hmh=True, decay_ratio=0.8)
    for device in (False, True):
        base = dict(kw, device_stream=device)
        full = run_sketch_pipeline(stream_reads([fixture]), SketchConfig(**base))

        # first run writes checkpoints; stop it after the whole file (the
        # checkpoint retained is the LAST interval's — resume from a fresh
        # 500-read prefix instead to simulate a mid-stream kill)
        import gzip
        import itertools

        lines = gzip.open(fixture, "rb").read().splitlines()
        prefix = [lines[i] for i in range(2000)]  # 500 reads * 4 lines

        def reads_from(ls):
            for i in range(0, len(ls), 4):
                yield ls[i + 1]

        r1 = run_sketch_pipeline(
            iter(list(reads_from(prefix))),
            SketchConfig(**base, checkpoint_path=ck),
        )
        assert os.path.exists(ck)

        r2 = run_sketch_pipeline(
            stream_reads([fixture]),
            SketchConfig(**base, resume_from=ck),
        )
        s_full = dict(full.hulk_data.signatures)
        s_res = dict(r2.hulk_data.signatures)
        for algo in ("histosketch", "kmv", "khf", "hyperminhash"):
            assert np.array_equal(
                s_full[algo].get_sketch(), s_res[algo].get_sketch()
            ), (device, algo)
        assert np.array_equal(
            s_full["histosketch"].sketch_weights, s_res["histosketch"].sketch_weights
        )
        assert r2.seq_count == full.seq_count
        assert r2.minimizer_count == full.minimizer_count
        assert r2.length_total == full.length_total


def test_bottom_k_values():
    import jax.numpy as jnp
    import numpy as np

    from hulk_tpu.ops.device_step import bottom_k_values

    U = np.uint64(0xFFFFFFFFFFFFFFFF)
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**60, 500, dtype=np.uint64)
    vals[rng.random(500) < 0.5] = U  # sentinel padding
    out = np.asarray(bottom_k_values(jnp.asarray(vals), 16))
    live = np.sort(vals[vals != U])
    exp = live[:16]
    assert np.array_equal(out[: exp.shape[0]], exp)
    assert (out[exp.shape[0]:] == U).all()


def test_packed4_step_matches_unpacked():
    """The nibble-packed transfer form (pack_codes4 + packed4=True) must be
    bit-identical to the raw-codes step — histogram, count, and value
    stream — including odd padded lengths."""
    import jax.numpy as jnp
    import numpy as np

    from hulk_tpu.ops.device_step import (
        pack_codes4,
        sketch_stream_step,
        sketch_stream_step_fused,
        stream_bucket,
        unpack_codes4,
    )
    from hulk_tpu.ops.encode import pack_reads

    rng = np.random.default_rng(5)
    K, W, NBINS = 11, 7, 11 ** 4
    for L in (160, 159):  # even and odd bucket widths
        seqs = [
            bytes(rng.choice(list(b"ACGTN"), size=int(rng.integers(K + W - 1, L)),
                             p=[0.24] * 4 + [0.04]).tolist())
            for _ in range(48)
        ]
        packed = pack_reads(seqs, pad_to=L, n_reads=48)
        p4 = pack_codes4(packed.codes)
        assert np.array_equal(
            np.asarray(unpack_codes4(jnp.asarray(p4)))[:, :L], packed.codes
        )
        bucket = stream_bucket(48, 48 * (L + L % 2))
        for step in (sketch_stream_step, sketch_stream_step_fused):
            h1, c1, sv1 = step(
                jnp.zeros(NBINS, dtype=jnp.int32), jnp.zeros((), dtype=jnp.int64),
                packed.codes, packed.lengths, k=K, w=W, bucket=bucket,
            )
            h2, c2, sv2 = step(
                jnp.zeros(NBINS, dtype=jnp.int32), jnp.zeros((), dtype=jnp.int64),
                p4, packed.lengths, k=K, w=W, bucket=bucket, packed4=True,
            )
            assert np.array_equal(np.asarray(h1), np.asarray(h2)), (L, step)
            assert int(c1) == int(c2)
            U = np.uint64(0xFFFFFFFFFFFFFFFF)
            a = np.asarray(sv1); a = np.sort(a[a != U])
            b = np.asarray(sv2); b = np.sort(b[b != U])
            assert np.array_equal(a, b)


def test_group_step_matches_per_batch_steps():
    """The grouped single-transfer scan step (one flat u8 buffer, one
    dispatch) must be bit-identical to G sequential fused steps plus the
    device KMV/KHF/HMH updates, including dead padding sub-batches."""
    import jax.numpy as jnp

    from hulk_tpu.ops.device_sketches import hmh_update, khf_update, kmv_update
    from hulk_tpu.ops.device_step import (
        bottom_k_values,
        build_group_buffer,
        fused_bits_ok,
        pack_codes4,
        sketch_stream_group_step,
        sketch_stream_step_fused,
        stream_bucket,
    )
    from hulk_tpu.ops.encode import pack_reads
    from hulk_tpu.sketch.hyperminhash import DEFAULT_P, DEFAULT_Q, DEFAULT_R

    rng = np.random.default_rng(5)
    K, W, NBINS, S_SK = 11, 5, 11 ** 4, 8
    R, L, G = 32, 96, 4
    assert fused_bits_ok(K, R)
    bucket = stream_bucket(R, R * L)
    sent = 0xFFFFFFFFFFFFFFFF

    batches = []
    for _ in range(G - 1):  # one dead pad batch exercises tail padding
        seqs = [
            bytes(rng.choice(list(b"ACGTN"), size=int(rng.integers(K + W - 1, L)),
                             p=[0.24] * 4 + [0.04]).tolist())
            for _ in range(R)
        ]
        batches.append(pack_reads(seqs, pad_to=L, n_reads=R))
    codes_list = [b.codes for b in batches] + [np.full((R, L), 5, np.uint8)]
    lengths_list = [b.lengths for b in batches] + [np.zeros(R, np.int32)]

    # reference: per-batch fused steps + device sketch updates
    h = jnp.zeros(NBINS, dtype=jnp.int32)
    c = jnp.zeros((), dtype=jnp.int64)
    kmv = jnp.full(S_SK, sent, dtype=jnp.uint64)
    khf = jnp.full(S_SK, sent, dtype=jnp.uint64)
    hmh = jnp.zeros(1 << DEFAULT_P, dtype=jnp.uint64)
    for codes, lengths in zip(codes_list, lengths_list):
        h, c, sv = sketch_stream_step_fused(
            h, c, jnp.asarray(pack_codes4(codes)), jnp.asarray(lengths),
            k=K, w=W, bucket=bucket, packed4=True,
        )
        kmv = kmv_update(kmv, bottom_k_values(sv, S_SK))
        khf = khf_update(khf, sv)
        hmh = hmh_update(hmh, sv, p=DEFAULT_P, q=DEFAULT_Q, r=DEFAULT_R)

    # grouped: one buffer, one dispatch
    h2 = jnp.zeros(NBINS, dtype=jnp.int32)
    c2 = jnp.zeros((), dtype=jnp.int64)
    kmv2 = jnp.full(S_SK, sent, dtype=jnp.uint64)
    khf2 = jnp.full(S_SK, sent, dtype=jnp.uint64)
    hmh2 = jnp.zeros(1 << DEFAULT_P, dtype=jnp.uint64)
    buf = jnp.asarray(build_group_buffer(codes_list, lengths_list))
    h2, c2, kmv2, khf2, hmh2 = sketch_stream_group_step(
        h2, c2, kmv2, khf2, hmh2, buf, g=G, r=R, l=L, k=K, w=W,
        bucket=bucket, use_kmv=True, use_khf=True, use_hmh=True,
        hmh_pqr=(DEFAULT_P, DEFAULT_Q, DEFAULT_R),
    )
    assert np.array_equal(np.asarray(h), np.asarray(h2))
    assert int(c) == int(c2)
    assert np.array_equal(np.asarray(kmv), np.asarray(kmv2))
    assert np.array_equal(np.asarray(khf), np.asarray(khf2))
    assert np.array_equal(np.asarray(hmh), np.asarray(hmh2))


def test_seek_resume_native_bit_identical(tmp_path):
    """Native-path resume must SEEK (skip earlier files, line-skip the
    boundary file's consumed prefix) rather than replay: output is
    bit-identical to the uninterrupted run AND the resumed run parses only
    the post-checkpoint tail (asserted via the parse_bytes progress
    counter on the underlying batch reader)."""
    import gzip
    import os

    import numpy as np

    from hulk_tpu.stream.fastq import batch_reads_native
    from hulk_tpu.stream.pipeline import (
        SketchConfig, _load_checkpoint, run_sketch_pipeline,
    )
    from hulk_tpu.sketch.histosketch import HistoSketch
    from hulk_tpu.sketch.minhash import KHFSketch, KMVSketch

    rng = np.random.default_rng(12)

    def write_fq(path, n, length=80):
        with gzip.open(path, "wb") as fh:
            for i in range(n):
                seq = bytes(rng.choice(list(b"ACGT"), size=length).tolist())
                fh.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * length))

    f1 = str(tmp_path / "a.fq.gz")
    f2 = str(tmp_path / "b.fq.gz")
    write_fq(f1, 300)
    write_fq(f2, 260)
    ck = str(tmp_path / "ck.npz")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, interval=100, kmv=True, khf=True,
              batch_size=64, device_stream=False)

    full = run_sketch_pipeline(None, SketchConfig(**kw, input_paths=[f1, f2]))

    # interrupted run over the first file only -> last checkpoint at read 300
    r1 = run_sketch_pipeline(
        None, SketchConfig(**kw, input_paths=[f1], checkpoint_path=ck)
    )
    assert r1.seq_count == 300

    # the checkpoint must carry the seek origin (file 0 fully consumed)
    hs = HistoSketch(11, 8, 11 ** 4, 1.0)
    sc, _, _, origin = _load_checkpoint(
        ck, SketchConfig(**kw), hs, KMVSketch(11, 8), KHFSketch(11, 8), None
    )
    assert sc == 300 and origin == (0, 300)

    # resumed run: bit-identical result
    r2 = run_sketch_pipeline(
        None, SketchConfig(**kw, input_paths=[f1, f2], resume_from=ck)
    )
    s_full = dict(full.hulk_data.signatures)
    s_res = dict(r2.hulk_data.signatures)
    for algo in ("histosketch", "kmv", "khf"):
        assert np.array_equal(
            s_full[algo].get_sketch(), s_res[algo].get_sketch()
        ), algo
    assert np.array_equal(
        s_full["histosketch"].sketch_weights, s_res["histosketch"].sketch_weights
    )
    assert r2.seq_count == full.seq_count
    assert r2.minimizer_count == full.minimizer_count

    # bounded re-read: with the origin as seek target, the reader must feed
    # the parser ONLY file 2's bytes (file 1 is never opened/parsed)
    progress = {}
    batches = list(
        batch_reads_native([f1, f2], batch_size=64, start_file=origin[0],
                           skip_reads=origin[1], progress=progress)
    )
    n_resumed = sum(int((b.lengths > 0).sum()) for b in batches)
    assert n_resumed == 260
    raw2 = len(gzip.open(f2, "rb").read())
    assert progress["parse_bytes"] <= raw2  # file 1 contributed nothing

    # mid-file seek: skip 100 records of file 1, parse the rest
    progress2 = {}
    batches = list(
        batch_reads_native([f1, f2], batch_size=64, start_file=0,
                           skip_reads=100, progress=progress2)
    )
    n2 = sum(int((b.lengths > 0).sum()) for b in batches)
    assert n2 == 200 + 260
    raw1 = len(gzip.open(f1, "rb").read())
    assert progress2["parse_bytes"] < raw1 * 2 / 3 + raw2 + (1 << 16)
    origins = [(b.file_idx, b.reads_in_file_end) for b in batches]
    assert origins[-1] == (1, 260)


def test_device_flush_bit_identical(tables):
    """The production device flush (device CMS + device argmin + exact
    host candidate recheck) must produce BIT-identical histosketch mins,
    weights, and CMS state vs the host flush, in final-only and interval
    modes."""
    import jax.numpy as jnp

    reads = mkreads(220, length=100)
    for interval in (0, 60):
        r_host = run_cfg(reads, tables, interval=interval, device_stream=True,
                         batch_size=32, data_parallel=False)
        r_dev = run_cfg(reads, tables, interval=interval, device_stream=True,
                        batch_size=32, data_parallel=False, device_flush=True)
        hs_h = dict(r_host.hulk_data.signatures)["histosketch"]
        hs_d = dict(r_dev.hulk_data.signatures)["histosketch"]
        assert np.array_equal(hs_h.sketch, hs_d.sketch), interval
        assert np.array_equal(
            np.asarray(hs_h.sketch_weights).view(np.uint64),
            np.asarray(hs_d.sketch_weights).view(np.uint64),
        ), interval
        assert np.array_equal(hs_h.cms.sketch, hs_d.cms.sketch), interval
        assert r_host.minimizer_count == r_dev.minimizer_count
        assert hs_h.get_md5() == hs_d.get_md5()


def test_device_flush_drift_rejected(tables):
    reads = mkreads(40)
    import pytest as _pytest

    with _pytest.raises(PipelineError, match="decayRatio=1.0"):
        run_cfg(reads, tables, decay_ratio=0.5, device_stream=True,
                device_flush=True, data_parallel=False)


def test_device_flush_margin_overflow_falls_back(tables, monkeypatch):
    """With an absurd margin bound every element is a 'candidate', the
    margin count overflows top_t, and the flusher must fall back to the
    exact host flush — output still bit-identical."""
    import hulk_tpu.parallel.mesh as meshmod

    monkeypatch.setattr(meshmod, "FLUSH_MARGIN_REL", 1e30)
    reads = mkreads(220, length=100)
    r_host = run_cfg(reads, tables, device_stream=True, batch_size=32,
                     data_parallel=False)
    r_dev = run_cfg(reads, tables, device_stream=True, batch_size=32,
                    data_parallel=False, device_flush=True)
    hs_h = dict(r_host.hulk_data.signatures)["histosketch"]
    hs_d = dict(r_dev.hulk_data.signatures)["histosketch"]
    assert np.array_equal(hs_h.sketch, hs_d.sketch)
    assert np.array_equal(
        np.asarray(hs_h.sketch_weights).view(np.uint64),
        np.asarray(hs_d.sketch_weights).view(np.uint64),
    )


# ---- opt-in per-interval secondary-sketch snapshots (--streamAll) ---------


@pytest.mark.parametrize("device", [False, True])
def test_interval_secondary_snapshot_equals_final(tables, device):
    """With interval == stream length, the single interval snapshot is taken
    after every read: --streamAll snapshots must carry KMV/KHF/HMH states
    identical to the final output's."""
    reads = mkreads(64)
    cfg = SketchConfig(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=DIMS,
        interval=64, kmv=True, khf=True, hmh=True, interval_secondary=True,
        device_stream=device, batch_size=16, data_parallel=False,
    )
    snaps = []
    import hulk_tpu.sketch.histosketch as hsmod

    orig = hsmod.get_cws_tables
    hsmod.get_cws_tables = lambda s, d: tables
    try:
        res = run_sketch_pipeline(iter(reads), cfg, on_interval=snaps.append)
    finally:
        hsmod.get_cws_tables = orig
    assert len(snaps) == 1
    snap_sigs = dict(snaps[0].signatures)
    final_sigs = dict(res.hulk_data.signatures)
    assert set(snap_sigs) == {"histosketch", "kmv", "khf", "hyperminhash"}
    for algo in ("kmv", "khf", "hyperminhash"):
        np.testing.assert_array_equal(
            np.asarray(snap_sigs[algo].get_sketch(), dtype=np.uint64),
            np.asarray(final_sigs[algo].get_sketch(), dtype=np.uint64),
        )


def test_interval_snapshot_default_histosketch_only(tables):
    reads = mkreads(32)
    cfg = SketchConfig(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=DIMS,
        interval=32, kmv=True, khf=True, device_stream=False, batch_size=16,
        data_parallel=False,
    )
    snaps = []
    import hulk_tpu.sketch.histosketch as hsmod

    orig = hsmod.get_cws_tables
    hsmod.get_cws_tables = lambda s, d: tables
    try:
        run_sketch_pipeline(iter(reads), cfg, on_interval=snaps.append)
    finally:
        hsmod.get_cws_tables = orig
    assert [a for a, _ in snaps[0].signatures] == ["histosketch"]


# ---- compact fused step (per-row sort compaction before the global sort) --


def _rand_codes(r, l, read_len, seed, nfrac=0.01):
    rng = np.random.default_rng(seed)
    codes = rng.choice(
        np.arange(5, dtype=np.uint8), size=(r, l), p=[(1 - nfrac) / 4] * 4 + [nfrac]
    )
    codes[:, read_len:] = 5
    lengths = np.full(r, read_len, dtype=np.int32)
    return codes, lengths


@pytest.mark.parametrize("kk,ww,ll,rl", [(11, 5, 128, 120), (21, 9, 256, 250)])
def test_compact_step_bit_equal(kk, ww, ll, rl):
    import jax.numpy as jnp

    from hulk_tpu.ops.device_step import (
        sketch_stream_step_fused,
        stream_bucket,
    )

    r = 64
    codes, lengths = _rand_codes(r, ll, rl, seed=kk * 7)
    bucket = stream_bucket(r, r * ll)
    outs = []
    for compact in (False, True):
        hist = jnp.zeros(14641, dtype=jnp.int32)
        count = jnp.zeros((), dtype=jnp.int64)
        hist, count, svals = sketch_stream_step_fused(
            hist, count, codes, lengths, k=kk, w=ww, bucket=bucket,
            compact=compact,
        )
        vals = np.asarray(svals)
        outs.append((np.asarray(hist), int(count), np.sort(vals[vals != np.uint64(2**64 - 1)])))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    np.testing.assert_array_equal(outs[0][2], outs[1][2])


def test_compact_step_overflow_falls_back_exactly(monkeypatch):
    """A batch where reads have more live lanes than the compaction width:
    the overflow cond must divert to the full-width branch, keeping
    exactness. The width is forced tiny via monkeypatch (natural overflow
    needs adversarial hash sequences); a fresh (k, w, bucket) combination
    guarantees a fresh trace that sees the patched width."""
    import jax.numpy as jnp

    from hulk_tpu.ops import device_step as ds

    monkeypatch.setattr(ds, "compact_width", lambda l, w: 32)
    kk, ww, ll, rl = 13, 7, 256, 256  # ~60 live lanes/row >> 32
    r = 8
    codes, lengths = _rand_codes(r, ll, rl, seed=6)
    bucket = 8 * r  # also exercises the inner bucket-overflow cond
    outs = []
    for compact in (False, True):
        hist = jnp.zeros(28561, dtype=jnp.int32)
        count = jnp.zeros((), dtype=jnp.int64)
        hist, count, _ = ds.sketch_stream_step_fused(
            hist, count, codes, lengths, k=kk, w=ww, bucket=bucket,
            compact=compact,
        )
        outs.append((np.asarray(hist), int(count)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]


def test_group_step_compact_matches_plain(tables):
    """Grouped scan with compact=True produces the identical carries."""
    import jax
    import jax.numpy as jnp

    from hulk_tpu.ops.device_step import (
        build_group_buffer,
        sketch_stream_group_step,
        stream_bucket,
    )

    g, r, l, rl = 4, 32, 128, 120
    codes_list, lengths_list = [], []
    for i in range(g):
        c, ln = _rand_codes(r, l, rl, seed=100 + i)
        codes_list.append(c)
        lengths_list.append(ln)
    flat = build_group_buffer(codes_list, lengths_list)
    outs = []
    for compact in (False, True):
        hist = jnp.zeros(DIMS, dtype=jnp.int32)
        count = jnp.zeros((), dtype=jnp.int64)
        kmv = jnp.full(8, 2**64 - 1, dtype=jnp.uint64)
        khf = jnp.full(8, 2**64 - 1, dtype=jnp.uint64)
        hmh = jnp.zeros(1, dtype=jnp.uint64)
        out = sketch_stream_group_step(
            hist, count, kmv, khf, hmh, jax.device_put(flat),
            g=g, r=r, l=l, k=K, w=W, bucket=stream_bucket(r, r * l),
            use_kmv=True, use_khf=True, compact=compact,
        )
        outs.append([np.asarray(x) for x in out])
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)


def test_compact_width_invariants():
    from hulk_tpu.ops.device_step import compact_width
    from hulk_tpu.stream.fastq import DEFAULT_LENGTH_BUCKETS

    for L in DEFAULT_LENGTH_BUCKETS:
        for w in (1, 5, 9, 31, 256):
            c = compact_width(L, w)
            assert 0 < c <= L
            # covers the expected live density with >= 1.5x headroom
            assert c == L or c >= (3 * L) // (w + 1) + 16


def test_auto_batch_size_fused_capable():
    from hulk_tpu.ops.device_step import fused_bits_ok

    for k in range(1, 32):
        cfg = SketchConfig(kmer_size=k)
        r = cfg.resolved_batch_size()
        assert 2048 <= r <= 16384
        # auto picks a fused-capable R whenever one exists at all
        if fused_bits_ok(k, 2048):
            assert fused_bits_ok(k, r)
        # explicit sizes are honoured verbatim
        assert SketchConfig(kmer_size=k, batch_size=512).resolved_batch_size() == 512


def test_long_bucket_stream_step_equal():
    """1 kb reads: the length-aware bucket (stream_bucket with l/k/w) must
    keep the compacted branch exact — and actually engage it (the fixed
    32/read bucket would throw every such batch to the full-width branch)."""
    import jax.numpy as jnp

    from hulk_tpu.ops.device_step import (
        sketch_stream_step_fused,
        stream_bucket,
    )
    from hulk_tpu.ops.minimizer import minimizer_scan
    from hulk_tpu.sketch.spectrum import KmerSpectrum

    kk, ww, ll, rl = 21, 9, 1024, 1000
    r = 32
    codes, lengths = _rand_codes(r, ll, rl, seed=77)
    bucket = stream_bucket(r, r * ll, l=ll, k=kk, w=ww)
    assert 32 * r < bucket < r * ll  # the new sizing engaged
    hist = jnp.zeros(21 ** 4, dtype=jnp.int32)
    count = jnp.zeros((), dtype=jnp.int64)
    hist, count, _ = sketch_stream_step_fused(
        hist, count, codes, lengths, k=kk, w=ww, bucket=bucket, compact=True,
    )
    vals, mask = minimizer_scan(codes, lengths, k=kk, w=ww)
    flat = np.asarray(vals)[np.asarray(mask)]
    host = KmerSpectrum(21 ** 4)
    host.add_hashes(flat)
    np.testing.assert_array_equal(np.asarray(hist).astype(np.float64), host.bins)
    assert int(count) == flat.shape[0]
