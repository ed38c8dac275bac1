"""Closed-loop validation of the Go math/rand replica.

The expected constants are the universally-documented outputs of
rand.New(rand.NewSource(1)) in Go — if these match, the reconstructed
rngCooked table, the seeding path and the ALFG stepping are all correct
(a 64-bit match on consecutive outputs cannot happen by accident).
"""
import numpy as np

from hulk_tpu.hashes.gorand import GoRand

GO_SEED1_INT63 = [
    5577006791947779410,
    8674665223082153551,
    6129484611666145821,
]
GO_SEED1_FLOAT64 = [
    0.6046602879796196,
    0.9405090880450124,
    0.6645600532184904,
]


def test_int63_seed1():
    r = GoRand(1)
    assert [r.int63() for _ in range(3)] == GO_SEED1_INT63


def test_float64_seed1():
    r = GoRand(1)
    got = [r.float64() for _ in range(3)]
    assert got == GO_SEED1_FLOAT64


def test_block_matches_scalar():
    a, b = GoRand(1), GoRand(1)
    blk = b.float64_block(10_000)
    sc = np.array([a.float64() for _ in range(10_000)])
    assert np.array_equal(blk, sc)


def test_seed_zero_and_other_seeds_differ():
    assert GoRand(0).int63() != GoRand(1).int63()
    assert GoRand(2).int63() != GoRand(1).int63()


def test_float64_range():
    r = GoRand(1)
    v = r.float64_range(0.0, 1.0)
    assert v == GO_SEED1_FLOAT64[0]
