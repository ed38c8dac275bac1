"""Bit-equality tests for the Pallas TPU jump-hash kernel vs the NumPy
reference implementation (itself oracle-tested against a literal scalar port
of dgryski/go-jump in test_hashes.py).

Interpret mode runs everywhere (CI on CPU); the compiled-kernel test runs
when a TPU backend is the default.
"""
import jax
import numpy as np
import pytest

from hulk_tpu.hashes.jumphash import jump_hash_np
from hulk_tpu.ops.jump_pallas import jump_hash_pallas, jump_hash_tpu

U64 = 0xFFFFFFFFFFFFFFFF
LANES = 128 * 64


def adversarial_keys() -> np.ndarray:
    """Keys whose first divisor d=(key>>33)+1 hits the rounding boundaries:
    d=1, d=2^31 (the q=1.0 special case), powers of two and neighbours."""
    ds = [1, 2, 3]
    for p in range(2, 32):
        ds += [(1 << p) - 1, 1 << p, (1 << p) + 1]
    ds = [d for d in ds if 1 <= d <= (1 << 31)]
    keys = np.array([(d - 1) << 33 for d in ds], dtype=np.uint64)
    keys = np.concatenate([keys, keys | np.uint64(0x1FFFFFFFF), keys | np.uint64(1)])
    return keys


def padded(keys: np.ndarray) -> np.ndarray:
    pad = (-keys.shape[0]) % LANES
    return np.concatenate([keys, np.zeros(pad, dtype=np.uint64)])


@pytest.mark.parametrize("n", [1, 2, 2000, 194481, 2**31 - 1])
def test_interpret_adversarial(n):
    keys = padded(adversarial_keys())
    got = np.asarray(jump_hash_pallas(keys, n, interpret=True))
    exp = jump_hash_np(keys, n)
    assert np.array_equal(got, exp), f"mismatch at n={n}"


def test_interpret_random():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, U64, LANES, dtype=np.uint64)
    keys[0] = 0
    keys[1] = U64
    for n in (2000, 194481):
        got = np.asarray(jump_hash_pallas(keys, n, interpret=True))
        exp = jump_hash_np(keys, n)
        assert np.array_equal(got, exp), f"mismatch at n={n}"


def test_wrapper_pads_any_length():
    rng = np.random.default_rng(12)
    keys = rng.integers(0, U64, 1000, dtype=np.uint64)
    got = np.asarray(jump_hash_tpu(keys, 194481, interpret=True))
    assert got.shape == (1000,)
    assert np.array_equal(got, jump_hash_np(keys, 194481))


def test_rejects_misaligned():
    with pytest.raises(ValueError, match="multiple of"):
        jump_hash_pallas(np.zeros(100, dtype=np.uint64), 10, interpret=True)


_ON_TPU = jax.default_backend() not in ("cpu", "gpu")


@pytest.mark.skipif(not _ON_TPU, reason="needs a TPU backend")
def test_compiled_tpu_adversarial_and_random():
    rng = np.random.default_rng(13)
    keys = padded(np.concatenate([
        adversarial_keys(),
        rng.integers(0, U64, 50_000, dtype=np.uint64),
        np.array([0, 1, U64], dtype=np.uint64),
    ]))
    for n in (2, 2000, 194481, 2**31 - 1):
        got = np.asarray(jump_hash_pallas(keys, n))
        exp = jump_hash_np(keys, n)
        assert np.array_equal(got, exp), f"TPU mismatch at n={n}"
