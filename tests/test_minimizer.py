"""Differential tests: vectorised minimizer op vs the literal Go-semantics
oracle, across base compositions (incl. N corruption), k/w shapes, and the
k=31 span-overflow quirk."""
import numpy as np
import pytest

from hulk_tpu.ops.encode import pack_reads
from hulk_tpu.ops.minimizer import minimizer_scan, short_read_mask
from tests.oracle_minimizer import minimizers_of

RNG = np.random.default_rng(42)


def random_read(n, n_frac=0.0, alphabet=b"ACGT"):
    bases = RNG.choice(list(alphabet), size=n)
    if n_frac:
        mask = RNG.random(n) < n_frac
        bases[mask] = ord("N")
    return bytes(bases.tolist())


def run_both(seqs, k, w):
    packed = pack_reads(seqs)
    vals, mask = minimizer_scan(packed.codes, packed.lengths, k=k, w=w)
    vals, mask = np.asarray(vals), np.asarray(mask)
    got = [set(vals[i][mask[i]].tolist()) for i in range(len(seqs))]
    exp = [minimizers_of(s, k, w) for s in seqs]
    return got, exp


@pytest.mark.parametrize("k,w", [(21, 9), (11, 5), (15, 30), (31, 9), (5, 9), (21, 1)])
def test_matches_oracle_random(k, w):
    seqs = [random_read(RNG.integers(w + k - 1, 300)) for _ in range(50)]
    got, exp = run_both(seqs, k, w)
    assert got == exp


@pytest.mark.parametrize("k,w", [(21, 9), (11, 5), (5, 9)])
def test_matches_oracle_with_ns(k, w):
    seqs = [random_read(200, n_frac=f) for f in (0.01, 0.05, 0.3, 1.0)]
    got, exp = run_both(seqs, k, w)
    assert got == exp


def test_matches_oracle_lowercase_and_u():
    seqs = [b"acgtACGTuuUUtgcaTGCA" * 5, b"nNnN" + random_read(100)]
    got, exp = run_both(seqs, 11, 5)
    assert got == exp


def test_homopolymer_symmetric_skip():
    # AT repeats produce many symmetric k-mers for even k
    seqs = [b"ATATATATATATATATATATATATATATATAT", random_read(64, alphabet=b"AT")]
    got, exp = run_both(seqs, 4, 3)
    assert got == exp


def test_exact_minimum_length_read():
    k, w = 21, 9
    seqs = [random_read(w + k - 1)]
    got, exp = run_both(seqs, k, w)
    assert got == exp
    assert 1 <= len(got[0]) <= w  # reports start at i=k-1; at most w values


def test_short_read_masking():
    lengths = np.array([0, 10, 28, 29, 100], dtype=np.int32)
    m = short_read_mask(lengths, 21, 9)
    assert m.tolist() == [True, True, True, False, False]


@pytest.mark.parametrize("k,w", [(3, 9), (2, 16), (5, 9), (28, 9), (31, 9), (31, 5), (7, 64)])
def test_u64max_never_reported(k, w):
    """Regression for the compacted device path's sentinel: a reported
    minimizer can never equal U64MAX for any legal (k, w) — including k<w,
    where negative sign-extended spans make PUSHED values of exactly U64MAX
    (span=-1 at i=w-3), and k=28..31, where hash<<8 reaches the top bits.
    Adversarial mix: random, symmetric-heavy (AT repeats), N-heavy."""
    U64 = 0xFFFFFFFFFFFFFFFF
    seqs = []
    for trial in range(45):
        n = int(RNG.integers(w + k - 1, 220))
        if trial % 3 == 0:
            seqs.append(random_read(n))
        elif trial % 3 == 1:
            s = bytearray((b"AT" * (n // 2 + 1))[:n])
            for _ in range(int(RNG.integers(0, 6))):
                s[int(RNG.integers(n))] = int(RNG.choice(list(b"ACGTN")))
            seqs.append(bytes(s))
        else:
            seqs.append(random_read(n, n_frac=0.3))
    got, exp = run_both(seqs, k, w)
    assert got == exp
    for g in exp:
        assert U64 not in g


def test_padding_is_inert():
    k, w = 21, 9
    seqs = [random_read(120), random_read(40)]
    p1 = pack_reads(seqs)
    p2 = pack_reads(seqs, pad_to=256, n_reads=4)
    v1, m1 = minimizer_scan(p1.codes, p1.lengths, k=k, w=w)
    v2, m2 = minimizer_scan(p2.codes, p2.lengths, k=k, w=w)
    for i in range(2):
        a = set(np.asarray(v1[i])[np.asarray(m1[i])].tolist())
        b = set(np.asarray(v2[i])[np.asarray(m2[i])].tolist())
        assert a == b
    assert not np.asarray(m2[2:]).any()
