"""Generate a synthetic FASTQ(.gz) benchmark input on disk.

Produces `n_reads` records of `read_len` random ACGT bases (1% N) with
constant quality, matching the fixture's record shape
(/root/reference/testing/test-reads-small.fq.gz: 4-line records, 100 bp).
Used by bench.py so the headline number includes gunzip + parse + pack +
host->device transfer — the same in-band costs the Go reference pays
(cmd/sketch.go:65-182).
"""
import gzip
import os
import sys

import numpy as np

ALPHABET = np.frombuffer(b"ACGTN", dtype=np.uint8)


def generate(path: str, n_reads: int, read_len: int = 150, seed: int = 0,
             gz_level: int = 1) -> str:
    rng = np.random.default_rng(seed)
    opener = (
        (lambda p: gzip.open(p, "wb", compresslevel=gz_level))
        if path.endswith(".gz")
        else (lambda p: open(p, "wb"))
    )
    qual = b"I" * read_len
    tmp = path + f".tmp{os.getpid()}"
    chunk = 20_000
    with opener(tmp) as fh:
        written = 0
        while written < n_reads:
            n = min(chunk, n_reads - written)
            # 1% N to exercise the reference's N-corruption quirk
            idx = rng.choice(5, size=(n, read_len), p=[0.2475] * 4 + [0.01])
            seqs = ALPHABET[idx]
            parts = []
            for i in range(n):
                parts.append(b"@r%d\n" % (written + i))
                parts.append(seqs[i].tobytes())
                parts.append(b"\n+\n")
                parts.append(qual)
                parts.append(b"\n")
            fh.write(b"".join(parts))
            written += n
    os.replace(tmp, path)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hulk_bench_reads.fq.gz"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    generate(out, n)
    print(out, os.path.getsize(out))
