"""Blockwise unbounded-length minimizer extraction (ops/longread.py) vs the
literal Go oracle and the whole-read vectorised scan.

Reference capability being matched: src/minimizer/minimizer.go:62-76 has no
upper length bound (FASTA contigs; cmd/sketch.go:51)."""
import numpy as np
import pytest

from hulk_tpu.ops.encode import encode_seq
from hulk_tpu.ops.longread import long_read_minimizers
from hulk_tpu.ops.minimizer import minimizer_scan

from tests.oracle_minimizer import minimizers_of

BASES = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _rand_seq(n, seed, n_frac=0.01):
    rng = np.random.default_rng(seed)
    probs = [(1 - n_frac) / 4] * 4 + [n_frac]
    return rng.choice(BASES, size=n, p=probs).tobytes()


def _oracle_sorted(seq, k, w):
    return np.sort(np.array(sorted(minimizers_of(seq, k, w)), dtype=np.uint64))


@pytest.mark.parametrize(
    "L,k,w,block",
    [
        (500, 21, 9, 128),     # many tiny blocks, heavy seam traffic
        (4096, 21, 9, 256),
        (1000, 3, 9, 64),      # k < w: negative-span quirk lives in block 0
        (2000, 31, 9, 256),    # max k
        (300, 7, 31, 64),      # large w halo
        (129, 21, 9, 128),     # L just past one block
        (128, 21, 9, 128),     # L exactly one block
    ],
)
def test_blockwise_matches_oracle(L, k, w, block):
    seq = _rand_seq(L, seed=L * 31 + k, n_frac=0.02)
    got = long_read_minimizers(encode_seq(seq), k=k, w=w, block=block, group=3)
    want = _oracle_sorted(seq, k, w)
    np.testing.assert_array_equal(got, want)


def test_blockwise_matches_whole_read_scan():
    """Same read scanned blockwise and as one [1, L] batch: identical set."""
    k, w = 21, 9
    seq = _rand_seq(20_000, seed=5)
    codes = encode_seq(seq)
    got = long_read_minimizers(codes, k=k, w=w, block=1024, group=4)
    vals, mask = minimizer_scan(codes[None, :], np.array([len(seq)], np.int32), k=k, w=w)
    want = np.asarray(vals)[np.asarray(mask)]
    np.testing.assert_array_equal(got, np.sort(want))


def test_megabase_contig_matches_oracle():
    """The VERDICT r4 acceptance case: a 1 Mb contig, bit-for-bit vs the
    literal transcription of the Go scan."""
    k, w = 21, 9
    seq = _rand_seq(1_000_000, seed=77, n_frac=0.005)
    got = long_read_minimizers(encode_seq(seq), k=k, w=w)
    want = _oracle_sorted(seq, k, w)
    np.testing.assert_array_equal(got, want)


def test_short_read_rejected():
    with pytest.raises(ValueError, match="w \\+ k - 1"):
        long_read_minimizers(encode_seq(b"ACGT"), k=21, w=9)


def test_block_must_exceed_halo():
    with pytest.raises(ValueError, match="halo"):
        long_read_minimizers(encode_seq(b"A" * 100), k=21, w=9, block=29)
