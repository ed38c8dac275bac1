"""Bit-equality of the Pallas minimizer-window kernel vs the XLA form
(itself differential-tested against the literal Go-semantics oracle).
Interpret mode runs everywhere; the compiled test runs on TPU backends."""
import jax
import numpy as np
import pytest

from hulk_tpu.ops.encode import pack_reads
from hulk_tpu.ops.minimizer import minimizer_window
from hulk_tpu.ops.minimizer_pallas import minimizer_window_pallas

RNG = np.random.default_rng(33)


def make_batch(r, l, n_frac=0.05, at_frac=0.2):
    seqs = []
    for i in range(r):
        n = int(RNG.integers(40, l))
        if i % 5 == 4:  # symmetric-heavy
            s = bytearray((b"AT" * (n // 2 + 1))[:n])
            for _ in range(4):
                s[int(RNG.integers(n))] = int(RNG.choice(list(b"ACGTN")))
            seqs.append(bytes(s))
        else:
            seqs.append(bytes(RNG.choice(
                list(b"ACGTN"), size=n,
                p=[(1 - n_frac) / 4] * 4 + [n_frac]).tolist()))
    return pack_reads(seqs, pad_to=l, n_reads=r)


def check(k, w, r=64, l=128, block_rows=8, interpret=True):
    packed = make_batch(r, l)
    wm1, rep1 = minimizer_window(packed.codes, packed.lengths, k=k, w=w)
    wm2, rep2 = minimizer_window_pallas(
        packed.codes, packed.lengths, k=k, w=w,
        block_rows=block_rows, interpret=interpret,
    )
    rep1, rep2 = np.asarray(rep1), np.asarray(rep2)
    assert np.array_equal(rep1, rep2), (k, w, "report mask")
    a = np.asarray(wm1)[rep1]
    b = np.asarray(wm2)[rep2]
    assert np.array_equal(a, b), (k, w, "window minima")


@pytest.mark.parametrize("k,w", [(21, 9), (11, 5), (5, 9), (15, 30), (31, 9), (21, 1), (2, 16)])
def test_interpret_matches_xla(k, w):
    check(k, w)


def test_interpret_long_reads():
    check(21, 9, r=16, l=512, block_rows=8)


def test_odd_shapes_padded_internally():
    packed = make_batch(8, 128)
    k, w = 11, 5
    codes = packed.codes[:6, :100]
    lengths = np.minimum(packed.lengths[:6], 100).astype(np.int32)
    wm1, rep1 = minimizer_window(codes, lengths, k=k, w=w)
    wm2, rep2 = minimizer_window_pallas(
        codes, lengths, k=k, w=w, block_rows=8, interpret=True
    )
    rep1 = np.asarray(rep1)
    assert np.array_equal(rep1, np.asarray(rep2))
    assert np.array_equal(np.asarray(wm1)[rep1], np.asarray(wm2)[rep1])


_ON_TPU = jax.default_backend() not in ("cpu", "gpu")


@pytest.mark.skipif(not _ON_TPU, reason="needs a TPU backend")
@pytest.mark.parametrize("k,w", [(21, 9), (11, 5), (31, 9)])
def test_compiled_tpu_matches_xla(k, w):
    check(k, w, r=512, l=256, block_rows=256, interpret=False)


def test_minimizer_scan_pallas_flag_interpret(monkeypatch):
    """minimizer_scan(pallas=True) must bit-match the XLA path (covers the
    k>=25 fallback route that keeps the Pallas window kernel; VERDICT r2
    item 6). Interpret mode substitutes for Mosaic off-TPU."""
    import hulk_tpu.ops.minimizer as m
    from functools import partial as _partial

    orig = minimizer_window_pallas
    monkeypatch.setattr(
        "hulk_tpu.ops.minimizer_pallas.minimizer_window_pallas",
        _partial(orig, interpret=True),
    )
    packed = make_batch(32, 256)
    for k, w in ((25, 9), (31, 9)):
        v1, m1 = m.minimizer_scan.__wrapped__(
            packed.codes, packed.lengths, k=k, w=w, pallas=False
        )
        v2, m2 = m.minimizer_scan.__wrapped__(
            packed.codes, packed.lengths, k=k, w=w, pallas=True
        )
        m1 = np.asarray(m1)
        assert np.array_equal(m1, np.asarray(m2))
        assert np.array_equal(np.asarray(v1)[m1], np.asarray(v2)[m1])
