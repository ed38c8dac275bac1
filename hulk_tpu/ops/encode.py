"""Host-side sequence encoding/packing.

Bytes -> 2-bit-plus-N codes via minimap2's seq_nt4_table (A/a=0, C/c=1,
G/g=2, T/t/U/u=3, everything else 4; reference src/minimizer/minimizer.go:13-30).
Reads are packed into fixed-shape [R, L] batches (padded) for device kernels.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SEQ_NT4_TABLE = np.full(256, 4, dtype=np.uint8)
for _b, _c in [
    (ord("A"), 0), (ord("a"), 0),
    (ord("C"), 1), (ord("c"), 1),
    (ord("G"), 2), (ord("g"), 2),
    (ord("T"), 3), (ord("t"), 3),
    (ord("U"), 3), (ord("u"), 3),
]:
    SEQ_NT4_TABLE[_b] = _c

PAD_CODE = 5  # never produced by the table; marks padding past read end


def encode_seq(seq: bytes) -> np.ndarray:
    return SEQ_NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)]


@dataclass
class PackedReads:
    """A fixed-shape batch of encoded reads."""

    codes: np.ndarray  # [R, L] uint8, PAD_CODE beyond each read's length
    lengths: np.ndarray  # [R] int32
    # input-stream origin for seek-based checkpoint resume (None when the
    # producer doesn't track it, e.g. the generic Python reads path)
    file_idx: int | None = None  # index into the producer's path list
    reads_in_file_end: int | None = None  # reads emitted from that file
    #   through the END of this batch

    @property
    def n_reads(self) -> int:
        return self.codes.shape[0]


def pack_reads(seqs: list[bytes], pad_to: int | None = None, n_reads: int | None = None) -> PackedReads:
    """Pack variable-length reads into one padded [R, L] batch.

    pad_to/n_reads allow fixed shapes across batches (static shapes keep a
    single XLA compilation alive for the whole stream).
    """
    R = n_reads if n_reads is not None else len(seqs)
    L = pad_to if pad_to is not None else max((len(s) for s in seqs), default=0)
    codes = np.full((R, L), PAD_CODE, dtype=np.uint8)
    lengths = np.zeros(R, dtype=np.int32)
    for i, s in enumerate(seqs):
        e = encode_seq(s)
        codes[i, : e.shape[0]] = e
        lengths[i] = e.shape[0]
    return PackedReads(codes=codes, lengths=lengths)
