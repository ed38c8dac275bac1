"""Native runtime cross-validation: every native path must be bit-identical
to its Python counterpart."""
import gzip
import os

import numpy as np
import pytest

from hulk_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build failed")


def test_native_fdlibm_bit_exact():
    from hulk_tpu.hashes.fdlibm import go_exp, go_log

    lib = native._load()
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.uniform(-700, 700, 20000),
        rng.uniform(-1e-3, 1e-3, 5000),
    ])
    for x in xs[:5000]:
        assert lib.hulk_go_exp(float(x)) == float(go_exp(x))
    ys = np.abs(xs) + 1e-300
    for y in ys[:5000]:
        assert lib.hulk_go_log(float(y)) == float(go_log(y))


def test_native_gorand_stream():
    import ctypes

    from hulk_tpu.hashes.gorand import GoRand, _rng_cooked

    lib = native._load()
    st = ctypes.create_string_buffer(lib.hulk_gorand_sizeof())
    cooked = np.ascontiguousarray(_rng_cooked().view(np.int64))
    lib.hulk_gorand_seed(st, 1, cooked.ctypes.data_as(ctypes.c_void_p))
    py = GoRand(1)
    for _ in range(2000):
        assert lib.hulk_gorand_int63(st) == py.int63()


def test_native_cws_tables_match_python():
    from hulk_tpu.hashes.cws import build_cws_tables

    out = native.cws_fill_native(4, 256)
    assert out is not None
    r, c, b, er = out
    t = build_cws_tables(4, 256)
    assert np.array_equal(r, t.r)
    assert np.array_equal(c, t.c)
    assert np.array_equal(b, t.b)
    assert np.array_equal(er, t.exp_r)


@pytest.mark.parametrize("decay", [1.0, 0.4])
def test_native_flush_matches_python(decay):
    from hulk_tpu.hashes.cws import build_cws_tables
    from hulk_tpu.sketch.countmin import cms_row_bins
    from hulk_tpu.sketch.histosketch import HistoSketch

    dims = 512
    tables = build_cws_tables(6, dims)
    rng = np.random.default_rng(1)
    bins = np.sort(rng.choice(dims, 100, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 20, 100).astype(np.float64)

    h = HistoSketch(21, 6, dims, decay, tables=tables)
    h.add_elements(bins, freqs)

    h2 = HistoSketch(21, 6, dims, decay, tables=tables)
    rb = cms_row_bins(bins.astype(np.uint64), h2.cms.depth, h2.cms.width)
    ok = native.flush_exact_native(
        bins, freqs, rb, h2.cms.sketch, tables.c, tables.b, tables.exp_r,
        h2.sketch, h2.sketch_weights, h2.apply_concept_drift, h2.cms.decay_weight,
    )
    assert ok
    assert np.array_equal(h.sketch, h2.sketch)
    assert np.array_equal(h.sketch_weights, h2.sketch_weights)
    assert np.array_equal(h.cms.sketch, h2.cms.sketch)


def test_native_fastq_packer_matches_python():
    from hulk_tpu.ops.encode import pack_reads
    from hulk_tpu.stream.fastq import stream_reads

    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    if not os.path.exists(fixture):
        pytest.skip("fixture missing")
    raw = gzip.open(fixture, "rb").read()

    packer = native.NativeFastqPacker(cap_reads=256, cap_len=128)
    got_codes, got_lengths = [], []
    # feed in awkward chunk sizes to exercise boundary handling
    for i in range(0, len(raw), 6_000):
        for codes, lengths in packer.feed(raw[i : i + 6_000]):
            got_codes.append(codes)
            got_lengths.append(lengths)
    got_codes = np.vstack(got_codes)
    got_lengths = np.concatenate(got_lengths)

    reads = list(stream_reads([fixture]))
    exp = pack_reads(reads, pad_to=128)
    assert got_codes.shape[0] == len(reads) == 1000
    assert np.array_equal(got_lengths, exp.lengths)
    # the raw packer leaves tails untouched; compare within each read
    col = np.arange(128)[None, :]
    valid = col < got_lengths[:, None]
    assert np.array_equal(
        np.where(valid, got_codes, 0), np.where(valid, exp.codes, 0)
    )


def test_native_batches_match_python_batches():
    """Pipeline results identical whether fed by the native packer or the
    Python reader, including interval cuts."""
    from hulk_tpu.stream.fastq import batch_reads, batch_reads_native, stream_reads

    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    if not os.path.exists(fixture):
        pytest.skip("fixture missing")
    a = list(batch_reads_native([fixture], batch_size=128, cut_every=300))
    b = list(
        batch_reads(stream_reads([fixture]), batch_size=128, cut_every=300)
    )
    na = int(sum((x.lengths > 0).sum() for x in a))
    nb = int(sum((x.lengths > 0).sum() for x in b))
    assert na == nb == 1000
    # flatten reads in order and compare codes
    def flat(batches):
        out = []
        for x in batches:
            for i in range(x.codes.shape[0]):
                if x.lengths[i] > 0:
                    out.append(bytes(x.codes[i, : x.lengths[i]]))
        return out

    assert flat(a) == flat(b)
    # cut boundaries: cumulative read counts hit multiples of 300
    counts = np.cumsum([(x.lengths > 0).sum() for x in a])
    for m in (300, 600, 900):
        assert m in counts


def test_pipeline_native_input_matches(tmp_path):
    import jax

    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline
    from hulk_tpu.stream.fastq import stream_reads

    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    if not os.path.exists(fixture):
        pytest.skip("fixture missing")
    cfg1 = SketchConfig(kmer_size=11, window_size=9, sketch_size=8,
                        spectrum_size=11 ** 4, device_stream=False)
    r1 = run_sketch_pipeline(stream_reads([fixture]), cfg1)
    cfg2 = SketchConfig(kmer_size=11, window_size=9, sketch_size=8,
                        spectrum_size=11 ** 4, device_stream=False,
                        input_paths=[fixture])
    r2 = run_sketch_pipeline(None, cfg2)
    h1 = dict(r1.hulk_data.signatures)["histosketch"]
    h2 = dict(r2.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.get_sketch(), h2.get_sketch())
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)
    assert r1.minimizer_count == r2.minimizer_count


def test_native_fasta_packer_matches_python(tmp_path):
    """Native FASTA parser vs the Python reader: multi-line records, records
    spanning chunk boundaries, CRLF, a file not ending in newline, per-file
    state reset, and the empty-line termination quirk."""
    import numpy as np

    from hulk_tpu.ops.encode import pack_reads
    from hulk_tpu.stream.fastq import batch_reads_native, stream_reads

    rng = np.random.default_rng(4)
    f1 = tmp_path / "a.fna"
    with open(f1, "wb") as fh:
        for i in range(137):
            n = int(rng.integers(30, 700))
            seq = bytes(rng.choice(list(b"ACGTN"), size=n).tolist())
            fh.write(b">c%d some description\r\n" % i)
            for j in range(0, n, 61):  # multi-line, CRLF mixed in
                fh.write(seq[j : j + 61] + (b"\r\n" if j % 2 else b"\n"))
    f2 = tmp_path / "b.fna"
    data = b">only\nACGTACGTACGTACGTACGTACGTACGTACGTACGTAC"  # no trailing \n
    f2.write_bytes(data)
    f3 = tmp_path / "c.fna"
    f3.write_bytes(
        b">x\nACGTACGTACGTACGTACGTACGTACGTACG\n\n>ignored\nGGGG\n"
    )  # empty line terminates the file; the rest is discarded

    paths = [str(f1), str(f2), str(f3)]
    got = []
    for b in batch_reads_native(paths, batch_size=64, fasta=True):
        for i in range(b.codes.shape[0]):
            if b.lengths[i] > 0:
                got.append(bytes(b.codes[i, : b.lengths[i]]))
    exp_reads = list(stream_reads(paths, fasta=True))
    exp = []
    for r in exp_reads:
        if len(r) > 0:
            p = pack_reads([r], pad_to=len(r))
            exp.append(bytes(p.codes[0, : len(r)]))
    assert len(got) == len(exp) == 137 + 1 + 1
    assert got == exp


def test_native_fasta_no_records_error(tmp_path):
    import pytest as _pytest

    from hulk_tpu.stream.fastq import FastqError, batch_reads_native

    f = tmp_path / "empty.fna"
    f.write_bytes(b"ACGT\nACGT\n")  # sequence but no header
    with _pytest.raises(FastqError, match="no FASTA records"):
        list(batch_reads_native([str(f)], batch_size=8, fasta=True))


def test_pipeline_native_fasta_matches_python(tmp_path):
    import numpy as np

    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    rng = np.random.default_rng(5)
    f = tmp_path / "reads.fasta"
    with open(f, "wb") as fh:
        for i in range(400):
            seq = bytes(rng.choice(list(b"ACGT"), size=150).tolist())
            fh.write(b">r%d\n" % i + seq[:80] + b"\n" + seq[80:] + b"\n")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, device_stream=False, fasta=True)
    r1 = run_sketch_pipeline(stream_reads([str(f)], fasta=True), SketchConfig(**kw))
    r2 = run_sketch_pipeline(None, SketchConfig(**kw, input_paths=[str(f)]))
    h1 = dict(r1.hulk_data.signatures)["histosketch"]
    h2 = dict(r2.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.get_sketch(), h2.get_sketch())
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)
    assert r1.minimizer_count == r2.minimizer_count


def test_native_pack_group_matches_numpy():
    """The fused native pad+nibble group packer is bit-identical to the NumPy
    build_group_buffer construction on the padded equivalents, including
    short batches, zero-length reads, odd buckets, and dead tail batches."""
    from hulk_tpu.ops.device_step import build_group_buffer

    rng = np.random.default_rng(0)
    for L in (160, 31):
        G_live, G, R, stride = 5, 6, 64, 256
        raw_batches, codes_list, lengths_list = [], [], []
        for g in range(G_live):
            rows = [64, 64, 17, 1, 63][g]
            codes = rng.integers(0, 6, (rows, stride), dtype=np.uint8)
            lengths = rng.integers(0, L + 1, rows).astype(np.int32)
            raw_batches.append((codes, lengths))
            padded = np.full((R, L), 5, dtype=np.uint8)
            plen = np.zeros(R, dtype=np.int32)
            plen[:rows] = lengths
            col = np.arange(L)[None, :]
            padded[:rows] = np.where(col < lengths[:, None], codes[:, :L], 5)
            codes_list.append(padded)
            lengths_list.append(plen)
        codes_list.append(np.full((R, L), 5, dtype=np.uint8))  # dead batch
        lengths_list.append(np.zeros(R, dtype=np.int32))
        ref = build_group_buffer(codes_list, lengths_list)
        got = native.pack_group(raw_batches, G, R, L)
        assert np.array_equal(ref, got)


def test_pipeline_raw_lane_matches_host(tmp_path):
    """input_paths + device_stream engages the RawReads lane (strided parser
    output + native group packer); output must equal the exact host path,
    including interval flushes and every secondary sketch."""
    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    rng = np.random.default_rng(11)
    f = tmp_path / "reads.fq"
    with open(f, "wb") as fh:
        for i in range(500):
            n = int(rng.integers(60, 151))
            seq = bytes(rng.choice(list(b"ACGTN"), p=[0.24] * 4 + [0.04], size=n).tolist())
            fh.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * n + b"\n")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, interval=150, kmv=True, khf=True, hmh=True)
    r_host = run_sketch_pipeline(
        stream_reads([str(f)]), SketchConfig(**kw, device_stream=False)
    )
    r_raw = run_sketch_pipeline(
        None,
        SketchConfig(**kw, device_stream=True, batch_size=64,
                     input_paths=[str(f)]),
    )
    for name, sig in r_host.hulk_data.signatures:
        other = dict(r_raw.hulk_data.signatures)[name]
        assert np.array_equal(sig.get_sketch(), other.get_sketch()), name
    h1 = dict(r_host.hulk_data.signatures)["histosketch"]
    h2 = dict(r_raw.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)
    assert r_host.minimizer_count == r_raw.minimizer_count
    assert r_host.seq_count == r_raw.seq_count


def test_pipeline_raw_lane_large_k_fallback(tmp_path):
    """k=28 fails fused_bits_ok at any R>1, so the raw lane must materialise
    padded batches (_pad_raw) for the two-sort fallback — same output."""
    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    rng = np.random.default_rng(13)
    f = tmp_path / "reads.fq"
    with open(f, "wb") as fh:
        for i in range(120):
            seq = bytes(rng.choice(list(b"ACGT"), size=150).tolist())
            fh.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * 150 + b"\n")
    kw = dict(kmer_size=28, window_size=9, sketch_size=8, spectrum_size=11 ** 4)
    r_host = run_sketch_pipeline(
        stream_reads([str(f)]), SketchConfig(**kw, device_stream=False)
    )
    r_raw = run_sketch_pipeline(
        None,
        SketchConfig(**kw, device_stream=True, batch_size=32,
                     input_paths=[str(f)]),
    )
    h1 = dict(r_host.hulk_data.signatures)["histosketch"]
    h2 = dict(r_raw.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.get_sketch(), h2.get_sketch())
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)
    assert r_host.minimizer_count == r_raw.minimizer_count


def test_pipeline_raw_lane_fasta(tmp_path):
    """FASTA + device stream also rides the raw lane (same packer contract)."""
    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    rng = np.random.default_rng(17)
    f = tmp_path / "reads.fasta"
    with open(f, "wb") as fh:
        for i in range(200):
            seq = bytes(rng.choice(list(b"ACGT"), size=130).tolist())
            fh.write(b">r%d\n" % i + seq[:70] + b"\n" + seq[70:] + b"\n")
    kw = dict(kmer_size=11, window_size=9, sketch_size=8,
              spectrum_size=11 ** 4, fasta=True)
    r_host = run_sketch_pipeline(
        stream_reads([str(f)], fasta=True), SketchConfig(**kw, device_stream=False)
    )
    r_raw = run_sketch_pipeline(
        None,
        SketchConfig(**kw, device_stream=True, batch_size=64,
                     input_paths=[str(f)]),
    )
    h1 = dict(r_host.hulk_data.signatures)["histosketch"]
    h2 = dict(r_raw.hulk_data.signatures)["histosketch"]
    assert np.array_equal(h1.get_sketch(), h2.get_sketch())
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)
    assert r_host.minimizer_count == r_raw.minimizer_count


def test_native_pack_group2_roundtrip():
    """v2 layout (2-bit + N bitmask): device-side unpack_codes2 reconstructs
    EXACTLY the padded codes the nibble path ships, and the group step over a
    v2 buffer is bit-identical to the nibble group step."""
    import jax
    import jax.numpy as jnp

    from hulk_tpu.ops.device_step import (
        _group_views,
        _group_views2,
        sketch_stream_group_step,
        stream_bucket,
        unpack_codes2,
        unpack_codes4,
    )

    rng = np.random.default_rng(3)
    G, R, L, stride = 3, 32, 64, 128
    raw_batches = []
    for g in range(G):
        rows = [32, 7, 31][g]
        # parser alphabet is 0..4 (NT4 never yields 5); Ns planted at ~8%
        codes = rng.choice(
            np.array([0, 1, 2, 3, 4], dtype=np.uint8), size=(rows, stride),
            p=[0.23, 0.23, 0.23, 0.23, 0.08],
        )
        lengths = rng.integers(0, L + 1, rows).astype(np.int32)
        raw_batches.append((codes, lengths))
    f4 = native.pack_group(raw_batches, G, R, L)
    f2 = native.pack_group2(raw_batches, G, R, L)
    c4, l4 = _group_views(jnp.asarray(f4), G, R, L)
    c2, m2, l2 = _group_views2(jnp.asarray(f2), G, R, L)
    assert np.array_equal(np.asarray(l4), np.asarray(l2))
    full4 = np.asarray(unpack_codes4(c4))
    full2 = np.asarray(unpack_codes2(c2, m2, l2))
    assert np.array_equal(full4, full2)

    # group step equality (k small so fused_bits_ok holds at R=32)
    def run(flat, packed2):
        hist = jnp.zeros(11 ** 4, dtype=jnp.int32)
        count = jnp.zeros((), dtype=jnp.int64)
        s = jnp.full(8, 0xFFFFFFFFFFFFFFFF, dtype=jnp.uint64)
        h = jnp.zeros(1, dtype=jnp.uint64)
        out = sketch_stream_group_step(
            hist, count, s, s.copy(), h, jnp.asarray(flat), g=G, r=R, l=L,
            k=11, w=5, bucket=stream_bucket(R, R * L), pallas=False,
            use_kmv=True, use_khf=True, packed2=packed2,
        )
        return [np.asarray(x) for x in out]

    o4 = run(f4, False)
    o2 = run(f2, True)
    for a, b in zip(o4, o2):
        assert np.array_equal(a, b)


def test_parallel_parser_matches_serial(tmp_path):
    """Chunks >= PAR_MIN_BYTES ride the OMP two-pass parser; reads must be
    identical to the serial loop on both input paths (plain file -> bytes
    chunks; .gz -> one whole-buffer ndarray), including interval cuts."""
    import gzip as _gzip

    from hulk_tpu.stream.fastq import batch_reads_native

    rng = np.random.default_rng(23)
    plain = tmp_path / "big.fq"
    with open(plain, "wb") as fh:
        for i in range(12000):
            n = int(rng.integers(40, 200))
            seq = bytes(
                rng.choice(list(b"ACGTN"), p=[0.24] * 4 + [0.04], size=n).tolist()
            )
            fh.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * n + b"\n")
    assert plain.stat().st_size > native.NativeFastqPacker.PAR_MIN_BYTES
    gz = tmp_path / "big.fq.gz"
    gz.write_bytes(_gzip.compress(plain.read_bytes()))

    def reads_of(path, **kw):
        out = []
        total = []
        for b in batch_reads_native([str(path)], batch_size=256, raw=True, **kw):
            for i in range(b.lengths.shape[0]):
                out.append(bytes(b.codes[i, : b.lengths[i]]))
            total.append(b.lengths.shape[0])
        return out, total

    old = native.NativeFastqPacker.PAR_MIN_BYTES
    try:
        par_plain, _ = reads_of(plain)
        par_gz, _ = reads_of(gz)
        native.NativeFastqPacker.PAR_MIN_BYTES = 1 << 62  # force serial
        ser_plain, _ = reads_of(plain)
    finally:
        native.NativeFastqPacker.PAR_MIN_BYTES = old
    assert par_plain == ser_plain
    assert par_gz == ser_plain
    # interval cut positions stay exact under the parallel parser
    cum = 0
    for b in batch_reads_native([str(gz)], batch_size=256, cut_every=1000, raw=True):
        cum += b.lengths.shape[0]
        if cum % 1000 == 0:
            continue
    assert cum == 12000
    cuts = []
    acc = 0
    for b in batch_reads_native([str(gz)], batch_size=256, cut_every=1000, raw=True):
        acc += b.lengths.shape[0]
        cuts.append(acc)
    for m in range(1000, 12001, 1000):
        assert m in cuts


def test_gunzip_multimember_and_high_ratio(tmp_path):
    """Real-world .gz shapes: concatenated members (cat a.fq.gz b.fq.gz, or
    bgzip's thousands of small members) decompress across the member loop;
    ultra-compressible input (poly-A reads, ratio >> 8x) exercises the
    output-buffer growth retry. Both must parse identically to the zlib
    streaming path."""
    if not native.gunzip_available():
        pytest.skip("libdeflate unavailable")
    import numpy as np

    from hulk_tpu.stream.fastq import batch_reads_native

    rng = np.random.default_rng(29)
    # many-member gz: 64 members of ~30 reads each
    recs = []
    for i in range(64 * 30):
        n = int(rng.integers(60, 120))
        seq = bytes(rng.choice(list(b"ACGT"), size=n).tolist())
        recs.append(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * n + b"\n")
    multi = tmp_path / "multi.fq.gz"
    with open(multi, "wb") as fh:
        for m in range(64):
            fh.write(gzip.compress(b"".join(recs[m * 30 : (m + 1) * 30])))
    # high-ratio gz: poly-A reads compress ~200x (output > 8x compressed)
    hi = tmp_path / "polya.fq.gz"
    hi.write_bytes(
        gzip.compress(
            b"".join(b"@p%d\n" % i + b"A" * 150 + b"\n+\n" + b"I" * 150 + b"\n"
                     for i in range(20000))
        )
    )
    raw = native.gunzip_bytes(hi.read_bytes())
    assert raw is not None and raw.shape[0] > 8 * hi.stat().st_size

    def reads_of(p):
        out = []
        for b in batch_reads_native([str(p)], batch_size=256, raw=True):
            for i in range(b.lengths.shape[0]):
                out.append(bytes(b.codes[i, : b.lengths[i]]))
        return out

    got = reads_of(multi)
    assert len(got) == 64 * 30
    exp = [bytes(bytearray({65: 0, 67: 1, 71: 2, 84: 3}[c] for c in r.split(b"\n")[1]))
           for r in recs]
    assert got == exp
    polya = reads_of(hi)
    assert len(polya) == 20000 and polya[0] == b"\x00" * 150
