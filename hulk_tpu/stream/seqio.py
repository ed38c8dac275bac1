"""Sequence utilities for API parity with the reference's seqio package
(src/seqio/seqio.go). Note the v1.0.0 pipeline carries quality data but never
invokes BaseCheck/ReverseComplement/QualityTrim (SURVEY.md §2.1 row 22);
they are provided here as vectorised utilities for downstream users.
"""
from __future__ import annotations

import numpy as np

FASTQ_ENCODING = 33

_COMPLEMENT = np.arange(256, dtype=np.uint8)
for a, b in [(ord("A"), ord("T")), (ord("T"), ord("A")), (ord("C"), ord("G")),
             (ord("G"), ord("C")), (ord("N"), ord("N"))]:
    _COMPLEMENT[a] = b

_UPPER = np.arange(256, dtype=np.uint8)
for c in range(ord("a"), ord("z") + 1):
    _UPPER[c] = c - 32


def base_check(seq: bytes) -> bytes:
    """Uppercase and replace non-ACGTN with N (seqio.go BaseCheck)."""
    arr = _UPPER[np.frombuffer(seq, dtype=np.uint8)]
    ok = np.isin(arr, np.frombuffer(b"ACGTN", dtype=np.uint8))
    arr = np.where(ok, arr, np.uint8(ord("N")))
    return arr.tobytes()


def reverse_complement(seq: bytes) -> bytes:
    arr = np.frombuffer(seq, dtype=np.uint8)
    return _COMPLEMENT[arr][::-1].tobytes()


def quality_trim(seq: bytes, qual: bytes, min_quality: int = 20) -> tuple[bytes, bytes]:
    """BWA-style two-ended quality trim (seqio.go QualityTrim):
    trim each end at the position maximising the running sum of
    (min_quality - phred)."""
    q = np.frombuffer(qual, dtype=np.uint8).astype(np.int64) - FASTQ_ENCODING
    n = q.shape[0]
    if n == 0:
        return seq, qual
    # 3' end: walk from the end accumulating (minq - q); cut at max>0
    diff = min_quality - q
    s = np.cumsum(diff[::-1])
    end_cut = 0
    if s.max() > 0:
        end_cut = int(np.argmax(s)) + 1
    keep_end = n - end_cut
    # 5' end on the remainder
    s2 = np.cumsum(diff[:keep_end])
    start_cut = 0
    if keep_end > 0 and s2.max() > 0:
        start_cut = int(np.argmax(s2)) + 1
    start_cut = min(start_cut, keep_end)
    return seq[start_cut:keep_end], qual[start_cut:keep_end]
