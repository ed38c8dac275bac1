"""Unbounded read length through the FULL stack: native parsers emit
LongRead items in stream order, the pipeline scans them blockwise, and the
final histosketch is bit-identical to the literal Go-composition oracle.

Reference capability: src/minimizer/minimizer.go:62-76 has no upper length
bound; FASTA mode exists for contigs (cmd/sketch.go:51)."""
import gzip
import os

import numpy as np
import pytest

from hulk_tpu import native
from hulk_tpu.hashes.cws import build_cws_tables
from hulk_tpu.stream.fastq import LongRead, batch_reads, batch_reads_native
from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline
from tests.oracle_pipeline import oracle_sketch_pipeline

K, W, S = 11, 5, 8
DIMS = K ** 4

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def tables():
    return build_cws_tables(S, DIMS)


def _rand_bases(rng, n, n_frac=0.01):
    return bytes(
        rng.choice(list(b"ACGTN"), size=n, p=[(1 - n_frac) / 4] * 4 + [n_frac]).tolist()
    )


def _fasta_bytes(records, wrap=61):
    out = []
    for i, seq in enumerate(records):
        out.append(f">contig_{i} test".encode())
        for j in range(0, len(seq), wrap):
            out.append(seq[j : j + wrap])
    return b"\n".join(out) + b"\n"


def _fastq_bytes(records):
    out = []
    for i, seq in enumerate(records):
        out += [f"@read_{i}".encode(), seq, b"+", b"I" * len(seq)]
    return b"\n".join(out) + b"\n"


@pytest.fixture(scope="module")
def mixed_records():
    rng = np.random.default_rng(31)
    return [
        _rand_bases(rng, 300),
        _rand_bases(rng, 100_000),  # past the 65536 cap -> LongRead
        _rand_bases(rng, 200),
        _rand_bases(rng, 70_000),
        # big enough that an interval holding only this read clears the
        # reference's MIN_USED_BINS fatal (kmerspectrum.go:93-96)
        _rand_bases(rng, 5000),
    ]


def _run_production(tmp_path, records, *, fasta, device, interval=0,
                    tables=None, decay=1.0, device_flush=False):
    data = _fasta_bytes(records) if fasta else _fastq_bytes(records)
    path = str(tmp_path / ("in.fasta.gz" if fasta else "in.fq.gz"))
    with gzip.open(path, "wb") as fh:
        fh.write(data)
    cfg = SketchConfig(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=DIMS,
        interval=interval, fasta=fasta, device_stream=device, batch_size=32,
        data_parallel=False, input_paths=[path], decay_ratio=decay,
        device_flush=device_flush,
    )
    import hulk_tpu.sketch.histosketch as hsmod

    orig = hsmod.get_cws_tables
    hsmod.get_cws_tables = lambda s, d: tables
    try:
        res = run_sketch_pipeline(None, cfg)
    finally:
        hsmod.get_cws_tables = orig
    hs = res.hulk_data.signatures[0][1]
    return (
        np.asarray(hs.sketch, dtype=np.uint64),
        np.asarray(hs.sketch_weights, dtype=np.float64),
        res.minimizer_count,
        res.seq_count,
        res.length_total,
    )


@needs_native
@pytest.mark.parametrize("device", [False, True])
def test_fasta_contigs_match_oracle(tmp_path, mixed_records, tables, device):
    """The VERDICT r4 acceptance: `hulk sketch --fasta` semantics on a file
    with >64 KB contigs, bit-for-bit vs the literal oracle."""
    mins, weights, count, seqs, total = _run_production(
        tmp_path, mixed_records, fasta=True, device=device, tables=tables
    )
    o_sketch, o_weights, o_count = oracle_sketch_pipeline(
        mixed_records, k=K, w=W, sketch_size=S, nbins=DIMS,
        decay_ratio=1.0, interval=0, tables=tables,
    )
    assert seqs == len(mixed_records)
    assert total == sum(len(r) for r in mixed_records)
    assert count == o_count
    np.testing.assert_array_equal(mins, np.array(o_sketch, dtype=np.uint64))
    np.testing.assert_array_equal(weights, np.array(o_weights))


@needs_native
def test_fastq_long_reads_match_oracle(tmp_path, mixed_records, tables):
    """Long SEQUENCE LINES in FASTQ (nanopore-style) take the same path."""
    mins, weights, count, seqs, _ = _run_production(
        tmp_path, mixed_records, fasta=False, device=True, tables=tables
    )
    o_sketch, o_weights, o_count = oracle_sketch_pipeline(
        mixed_records, k=K, w=W, sketch_size=S, nbins=DIMS,
        decay_ratio=1.0, interval=0, tables=tables,
    )
    assert (seqs, count) == (len(mixed_records), o_count)
    np.testing.assert_array_equal(mins, np.array(o_sketch, dtype=np.uint64))
    np.testing.assert_array_equal(weights, np.array(o_weights))


@needs_native
def test_fasta_interval_with_long_reads(tmp_path, mixed_records, tables):
    """Interval boundaries count long reads as one global read index."""
    mins, weights, count, _, _ = _run_production(
        tmp_path, mixed_records, fasta=True, device=True, interval=2,
        tables=tables,
    )
    o_sketch, o_weights, o_count = oracle_sketch_pipeline(
        mixed_records, k=K, w=W, sketch_size=S, nbins=DIMS,
        decay_ratio=1.0, interval=2, tables=tables,
    )
    assert count == o_count
    np.testing.assert_array_equal(mins, np.array(o_sketch, dtype=np.uint64))
    np.testing.assert_array_equal(weights, np.array(o_weights))


@needs_native
def test_fasta_long_reads_device_flush(tmp_path, mixed_records, tables):
    """Long-read host contributions merge onto the device histogram when
    --deviceFlush is on (pipeline._merge_host_hist)."""
    got = _run_production(
        tmp_path, mixed_records, fasta=True, device=True, tables=tables,
        device_flush=True,
    )
    want = _run_production(
        tmp_path, mixed_records, fasta=True, device=True, tables=tables,
        device_flush=False,
    )
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    assert got[2:] == want[2:]


def test_python_batcher_long_reads_match_oracle(mixed_records, tables):
    """The non-native (iterator) input path: batch_reads emits LongRead for
    reads beyond the top length bucket."""
    cfg = SketchConfig(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=DIMS,
        device_stream=False, batch_size=16, data_parallel=False,
    )
    import hulk_tpu.sketch.histosketch as hsmod

    orig = hsmod.get_cws_tables
    hsmod.get_cws_tables = lambda s, d: tables
    try:
        res = run_sketch_pipeline(iter(mixed_records), cfg)
    finally:
        hsmod.get_cws_tables = orig
    hs = res.hulk_data.signatures[0][1]
    o_sketch, o_weights, o_count = oracle_sketch_pipeline(
        mixed_records, k=K, w=W, sketch_size=S, nbins=DIMS,
        decay_ratio=1.0, interval=0, tables=tables,
    )
    assert res.minimizer_count == o_count
    np.testing.assert_array_equal(
        np.asarray(hs.sketch, dtype=np.uint64), np.array(o_sketch, dtype=np.uint64)
    )
    np.testing.assert_array_equal(np.asarray(hs.sketch_weights), np.array(o_weights))


# ---- parser-level stream-order tests (small caps exercise the machinery) --


def _collect(items):
    """Flatten packer output to an ordered list of decoded record lengths,
    tagging long ones."""
    out = []
    for it in items:
        if isinstance(it, native.LongSeq):
            out.append(("long", int(it.codes.shape[0])))
        else:
            codes, lengths = it
            out.extend(("norm", int(l)) for l in lengths)
    return out


@needs_native
def test_fastq_packer_emits_long_in_order():
    rng = np.random.default_rng(7)
    recs = [_rand_bases(rng, n) for n in (80, 90, 700, 60, 900, 50)]
    p = native.NativeFastqPacker(cap_reads=64, cap_len=256)
    items = p.feed(_fastq_bytes(recs)) + p.end_of_file()
    want = [("long", n) if n >= 256 else ("norm", n) for n in (80, 90, 700, 60, 900, 50)]
    assert _collect(items) == want


@needs_native
def test_fastq_packer_long_codes_match_encode():
    from hulk_tpu.ops.encode import encode_seq

    rng = np.random.default_rng(8)
    seq = _rand_bases(rng, 500, n_frac=0.1)
    p = native.NativeFastqPacker(cap_reads=8, cap_len=128)
    items = p.feed(_fastq_bytes([seq])) + p.end_of_file()
    longs = [it for it in items if isinstance(it, native.LongSeq)]
    assert len(longs) == 1
    np.testing.assert_array_equal(longs[0].codes, encode_seq(seq))


@needs_native
def test_fasta_packer_long_record_spans_feeds():
    rng = np.random.default_rng(9)
    recs = [_rand_bases(rng, 70), _rand_bases(rng, 1000), _rand_bases(rng, 80)]
    data = _fasta_bytes(recs, wrap=37)
    p = native.NativeFastaPacker(cap_reads=64, cap_len=256)
    items = []
    for i in range(0, len(data), 101):  # drip-feed across many chunks
        items += p.feed(data[i : i + 101])
    items += p.end_of_file()
    assert _collect(items) == [("norm", 70), ("long", 1000), ("norm", 80)]
    longs = [it for it in items if isinstance(it, native.LongSeq)]
    from hulk_tpu.ops.encode import encode_seq

    np.testing.assert_array_equal(longs[0].codes, encode_seq(recs[1]))


@needs_native
def test_fasta_packer_empty_line_terminates_inside_long_record():
    """Reference semantics: an empty line emits the in-progress record and
    discards the rest of the file (sketch.go:104-105)."""
    rng = np.random.default_rng(10)
    long_seq = _rand_bases(rng, 600)
    data = b">a\n" + b"\n".join(
        long_seq[i : i + 50] for i in range(0, 600, 50)
    ) + b"\n\n>b\nACGTACGTACGT\n"
    p = native.NativeFastaPacker(cap_reads=8, cap_len=256)
    items = p.feed(data) + p.end_of_file()
    assert _collect(items) == [("long", 600)]


@needs_native
def test_fasta_packer_consecutive_long_records():
    rng = np.random.default_rng(11)
    recs = [_rand_bases(rng, 800), _rand_bases(rng, 900)]
    p = native.NativeFastaPacker(cap_reads=8, cap_len=256)
    items = p.feed(_fasta_bytes(recs)) + p.end_of_file()
    assert _collect(items) == [("long", 800), ("long", 900)]


@needs_native
def test_batch_reads_native_long_read_interval_accounting(tmp_path):
    """LongRead occupies one global read index: interval cuts land at the
    same record boundaries as an all-normal stream."""
    rng = np.random.default_rng(12)
    recs = [_rand_bases(rng, n) for n in (60, 70, 500, 80, 90, 95)]
    path = str(tmp_path / "x.fasta")
    with open(path, "wb") as fh:
        fh.write(_fasta_bytes(recs))
    per_read = []  # (kind, length, global index) in stream order
    idx = 0
    for b in batch_reads_native(
        [path], batch_size=4, cut_every=2, max_read_len=256, fasta=True
    ):
        if isinstance(b, LongRead):
            idx += 1
            per_read.append(("long", int(b.codes.shape[0]), idx))
            assert b.reads_in_file_end == idx
        else:
            lens = b.lengths[b.lengths > 0]
            lo = idx
            idx += int(lens.shape[0])
            per_read.extend(
                ("norm", int(l), lo + j + 1) for j, l in enumerate(lens)
            )
            assert b.reads_in_file_end == idx
            # no batch spans a cut boundary (interval determinism)
            assert (lo // 2) == ((idx - 1) // 2)
    assert [(k, n) for k, n, _ in per_read] == [
        ("norm", 60), ("norm", 70), ("long", 500),
        ("norm", 80), ("norm", 90), ("norm", 95),
    ]


def test_batch_reads_python_long():
    rng = np.random.default_rng(13)
    recs = [_rand_bases(rng, 100), _rand_bases(rng, 70_000), _rand_bases(rng, 90)]
    items = list(batch_reads(iter(recs), batch_size=4))
    kinds = [type(i).__name__ for i in items]
    assert "LongRead" in kinds
    lr = [i for i in items if isinstance(i, LongRead)][0]
    assert lr.codes.shape[0] == 70_000


@needs_native
def test_checkpoint_resume_with_long_reads(tmp_path, tables):
    """Seek-based resume across a stream containing LongReads: the resumed
    run bit-matches the uninterrupted run (long reads are one record = 4
    FASTQ lines, so newline-count seeking stays aligned)."""
    rng = np.random.default_rng(41)
    recs = (
        [_rand_bases(rng, 400) for _ in range(4)]
        + [_rand_bases(rng, 70_000)]
        + [_rand_bases(rng, 400) for _ in range(3)]
    )
    path = str(tmp_path / "ck.fq.gz")
    with gzip.open(path, "wb") as fh:
        fh.write(_fastq_bytes(recs))
    ck = str(tmp_path / "state.npz")
    kw = dict(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=DIMS,
        interval=2, batch_size=4, data_parallel=False, device_stream=True,
        kmv=True, khf=True, input_paths=[path],
    )
    import hulk_tpu.sketch.histosketch as hsmod

    orig = hsmod.get_cws_tables
    hsmod.get_cws_tables = lambda s, d: tables
    try:
        full = run_sketch_pipeline(None, SketchConfig(**kw))
        # run a 6-record prefix with checkpoints (covers the long read)
        p2 = str(tmp_path / "prefix.fq.gz")
        with gzip.open(p2, "wb") as fh:
            fh.write(_fastq_bytes(recs[:6]))
        run_sketch_pipeline(
            None, SketchConfig(**{**kw, "input_paths": [p2]},
                               checkpoint_path=ck),
        )
        assert os.path.exists(ck)
        resumed = run_sketch_pipeline(
            None, SketchConfig(**kw, resume_from=ck)
        )
    finally:
        hsmod.get_cws_tables = orig
    s_full = dict(full.hulk_data.signatures)
    s_res = dict(resumed.hulk_data.signatures)
    for algo in ("histosketch", "kmv", "khf"):
        np.testing.assert_array_equal(
            np.asarray(s_full[algo].get_sketch(), dtype=np.uint64),
            np.asarray(s_res[algo].get_sketch(), dtype=np.uint64),
        )
    assert resumed.minimizer_count == full.minimizer_count
    assert resumed.seq_count == full.seq_count
