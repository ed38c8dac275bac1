"""hash64 and jump-hash tests against scalar pure-Python oracles that follow
the reference algorithms literally (big-int arithmetic, no vectorisation)."""
import numpy as np

from hulk_tpu.hashes.hash64 import hash64_jnp, hash64_np
from hulk_tpu.hashes.jumphash import jump_hash_jnp, jump_hash_np

U64 = 0xFFFFFFFFFFFFFFFF


def hash64_scalar(key: int, mask: int) -> int:
    key = ((~key & U64) + (key << 21)) & mask
    key = key ^ (key >> 24)
    key = ((key + (key << 3)) + (key << 8)) & mask
    key = key ^ (key >> 14)
    key = ((key + (key << 2)) + (key << 4)) & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & mask
    return key


def jump_scalar(key: int, n: int) -> int:
    b, j = -1, 0
    while j < n:
        b = j
        key = (key * 2862933555777941757 + 1) & U64
        j = int(float(b + 1) * (2147483648.0 / float((key >> 33) + 1)))
    return b


def test_hash64_vs_scalar():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 63, 10_000, dtype=np.uint64) * np.uint64(2) + rng.integers(0, 2, 10_000, dtype=np.uint64)
    for k in (21, 11, 31):
        mask = (1 << (2 * k)) - 1
        got = hash64_np(keys & np.uint64(mask), mask)
        exp = np.array(
            [hash64_scalar(int(x) & mask, mask) for x in keys], dtype=np.uint64
        )
        assert np.array_equal(got, exp)
        got_j = np.asarray(hash64_jnp(keys & np.uint64(mask), mask))
        assert np.array_equal(got_j, exp)


def test_jump_hash_vs_scalar():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, U64, 20_000, dtype=np.uint64)
    for n in (2, 2000, 194481):
        got = jump_hash_np(keys, n)
        exp = np.array([jump_scalar(int(x), n) for x in keys], dtype=np.int32)
        assert np.array_equal(got, exp)
        assert got.min() >= 0 and got.max() < n


def test_jump_hash_jnp_matches_np():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, U64, 50_000, dtype=np.uint64)
    for n in (2000, 194481):
        a = jump_hash_np(keys, n)
        b = np.asarray(jump_hash_jnp(keys, n))
        assert np.array_equal(a, b)


def test_jump_hash_distribution():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, U64, 200_000, dtype=np.uint64)
    bins = jump_hash_np(keys, 100)
    counts = np.bincount(bins, minlength=100)
    assert counts.min() > 1600 and counts.max() < 2400  # ~2000 each


def test_jump_hash_exact_jnp_matches_np():
    from hulk_tpu.hashes.jumphash_exact import jump_hash_exact_jnp
    import jax

    rng = np.random.default_rng(9)
    keys = rng.integers(0, U64, 100_000, dtype=np.uint64)
    for n in (2, 2000, 194481, 2**31 - 1):
        a = np.asarray(jax.jit(lambda k, n=n: jump_hash_exact_jnp(k, n))(keys))
        b = jump_hash_np(keys, n)
        assert np.array_equal(a, b), f"mismatch at n={n}"


def test_jump_hash_exact_jnp_adversarial_keys():
    """Keys engineered so the first divisor d=(key>>33)+1 hits boundaries the
    integer-emulated rounding must handle: d=1, d=2^31 (the q=1.0 special
    case), powers of two and their neighbours (normalization edges)."""
    from hulk_tpu.hashes.jumphash_exact import jump_hash_exact_jnp
    import jax

    ds = [1, 2, 3]
    for p in range(2, 32):
        ds += [(1 << p) - 1, 1 << p, (1 << p) + 1]
    ds = [d for d in ds if 1 <= d <= (1 << 31)]
    keys = np.array([(d - 1) << 33 for d in ds], dtype=np.uint64)
    # also exercise low bits (they reach later iterations via the LCG)
    keys = np.concatenate([keys, keys | np.uint64(0x1FFFFFFFF), keys | np.uint64(1)])
    for n in (1, 2, 194481, 923521, 2**31 - 1):
        a = np.asarray(jax.jit(lambda k, n=n: jump_hash_exact_jnp(k, n))(keys))
        b = jump_hash_np(keys, n)
        assert np.array_equal(a, b), f"mismatch at n={n}"
