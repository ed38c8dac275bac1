"""Differential fuzz: the native FASTQ/FASTA packers (including the round-5
long-record overflow machinery) vs the pure-Python line parser
(stream/fastq._parse — a direct transcription of the reference FastqHandler,
src/pipeline/sketch.go:99-161) over randomized constructions: record
lengths straddling the stride cap, CRLF, FASTA wrap widths, pre-header
junk, empty-line termination, multi-chunk drip feeds."""
import gzip
import io

import numpy as np
import pytest

from hulk_tpu import native
from hulk_tpu.ops.encode import encode_seq
from hulk_tpu.stream.fastq import LongRead, _parse, batch_reads_native

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

CAP = 256  # small stride cap so ordinary fuzz lengths cross it


def _expected(records_bytes, fasta):
    """Reference parse -> list of encoded code arrays."""
    lines = [ln.rstrip(b"\r\n") for ln in records_bytes.split(b"\n")]
    if lines and lines[-1] == b"":
        lines.pop()
    return [encode_seq(s) for s in _parse(iter(lines), fasta)]


def _native_records(path, fasta, raw=False):
    out = []
    prev = 0
    for b in batch_reads_native(
        [path], batch_size=8, max_read_len=CAP, fasta=fasta, raw=raw
    ):
        if isinstance(b, LongRead):
            out.append(b.codes)
            prev = b.reads_in_file_end
        else:
            # padded batches carry dead pad rows; RawReads rows are all live
            live = (
                b.lengths.shape[0] if raw else b.reads_in_file_end - prev
            )
            prev = b.reads_in_file_end
            for i in range(live):
                L = int(b.lengths[i])
                out.append(np.ascontiguousarray(b.codes[i, :L]))
    return out


def _check(tmp_path, payload, fasta, name):
    path = str(tmp_path / name)
    with open(path, "wb") as fh:
        fh.write(payload)
    want = _expected(payload, fasta)
    for raw in (False, True):  # padded lane + the production RawReads lane
        got = _native_records(path, fasta, raw=raw)
        assert len(got) == len(want), (name, raw, len(got), len(want))
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(
                g, w, err_msg=f"{name} raw={raw} record {i}"
            )


def _rand_seq_bytes(rng, n):
    return bytes(rng.choice(list(b"ACGTNacgtn"), size=n).tolist())


@needs_native
@pytest.mark.parametrize("seed", range(8))
def test_fastq_fuzz(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 14))
    crlf = bool(rng.integers(0, 2))
    eol = b"\r\n" if crlf else b"\n"
    buf = io.BytesIO()
    for i in range(n):
        # lengths cluster around the cap to stress the overflow splitter
        ln = int(rng.choice([20, 100, CAP - 1, CAP, CAP + 1, 700, 2000]))
        seq = _rand_seq_bytes(rng, ln)
        buf.write(b"@r%d junk tags" % i + eol)
        buf.write(seq + eol)
        buf.write(b"+" + eol)
        buf.write(b"I" * ln + eol)
    _check(tmp_path, buf.getvalue(), fasta=False, name=f"f{seed}.fq")


@needs_native
@pytest.mark.parametrize("seed", range(8))
def test_fasta_fuzz(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 10))
    crlf = bool(rng.integers(0, 2))
    eol = b"\r\n" if crlf else b"\n"
    wrap = int(rng.choice([17, 60, 61, 255, 100000]))
    buf = io.BytesIO()
    if rng.integers(0, 3) == 0:
        # pre-header junk (possibly exceeding the cap): discarded at the
        # first '>' like the reference accumulate-then-drop
        for _ in range(int(rng.integers(1, 6))):
            buf.write(_rand_seq_bytes(rng, int(rng.integers(10, 400))) + eol)
    for i in range(n):
        ln = int(rng.choice([20, 100, CAP - 1, CAP, CAP + 1, 900, 3000]))
        seq = _rand_seq_bytes(rng, ln)
        buf.write(b">c%d desc" % i + eol)
        for j in range(0, ln, wrap):
            buf.write(seq[j : j + wrap] + eol)
    _check(tmp_path, buf.getvalue(), fasta=True, name=f"f{seed}.fa")


@needs_native
@pytest.mark.parametrize("seed", range(4))
def test_fasta_fuzz_empty_line_termination(tmp_path, seed):
    """An empty line mid-file terminates parsing (reference
    sketch.go:104-105), wherever it lands relative to a long record."""
    rng = np.random.default_rng(200 + seed)
    buf = io.BytesIO()
    lens = [100, 900, 150, 3000, 80]
    cut_after = int(rng.integers(0, len(lens)))
    for i, ln in enumerate(lens):
        seq = _rand_seq_bytes(rng, ln)
        buf.write(b">c%d\n" % i)
        for j in range(0, ln, 61):
            buf.write(seq[j : j + 61] + b"\n")
        if i == cut_after:
            buf.write(b"\n")  # terminator
            buf.write(b"this is never parsed\n")
            break
    _check(tmp_path, buf.getvalue(), fasta=True, name=f"t{seed}.fa")


@needs_native
def test_fastq_fuzz_gz_drip(tmp_path):
    """Gzip input parsed through the streaming path with records straddling
    chunk boundaries (drip-fed decompression)."""
    rng = np.random.default_rng(300)
    buf = io.BytesIO()
    for i in range(30):
        ln = int(rng.choice([150, CAP + 5, 1200]))
        seq = _rand_seq_bytes(rng, ln)
        buf.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * ln + b"\n")
    payload = buf.getvalue()
    path = str(tmp_path / "drip.fq.gz")
    with gzip.open(path, "wb") as fh:
        fh.write(payload)
    want = _expected(payload, fasta=False)
    got = _native_records(path, fasta=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@needs_native
def test_fasta_huge_preheader_junk_returns_to_native(tmp_path):
    """A junk prefix past the stride cap must not trap the parser in the
    Python record loop: after the discard at the first '>', normal records
    batch natively again (and the junk itself is never held in memory)."""
    rng = np.random.default_rng(400)
    junk = b"\n".join(
        _rand_seq_bytes(rng, 80) for _ in range(3 + (2 * CAP) // 80)
    )
    recs = [(i, _rand_seq_bytes(rng, 60 + i)) for i in range(12)]
    payload = junk + b"\n" + b"".join(
        b">c%d\n%s\n" % (i, s) for i, s in recs
    )
    path = str(tmp_path / "junk.fa")
    with open(path, "wb") as fh:
        fh.write(payload)
    want = _expected(payload, fasta=True)
    got = _native_records(path, fasta=True)
    assert len(want) == 12
    assert len(got) == 12
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # native batching resumed: the first batch after the junk is FULL
    # (8 records), not the Python loop's single-record pairs
    first = next(iter(batch_reads_native(
        [path], batch_size=8, max_read_len=CAP, fasta=True
    )))
    assert not isinstance(first, LongRead) and first.reads_in_file_end == 8
