"""Reconstruct Go's math/rand `rngCooked` seeding table without a Go toolchain.

Go's math/rand uses a 607/273 additive lagged-Fibonacci generator (ALFG).
`rngSource.Seed` mixes a small LCG stream with a baked-in table `rngCooked`,
which upstream generated (gen_cooked.go) by seeding the ALFG with a *historic*
seeding routine and stepping it 7.8e12 times.

Stepping 7.8e12 times naively is hours; the ALFG recurrence
    x_n = x_{n-273} + x_{n-607}   (mod 2^64)
is linear, so we jump ahead with polynomial exponentiation modulo the
characteristic polynomial f(t) = t^607 - t^334 - 1 over Z/2^64.

Validation is closed-loop: with the reconstructed table, Seed(1) must
reproduce the well-known Go outputs
    Int63() #1 = 5577006791947779410
    Int63() #2 = 8674665223082153551
    (=> Float64 #1 = 0.6046602879796196)
A 64-bit match on two consecutive outputs leaves no room for an incorrect
table. Output: hulk_tpu/hashes/_data/rng_cooked.npy (607 int64 values).
"""
import numpy as np

LEN = 607
TAP = 273
FEEDGAP = LEN - TAP  # 334
M31 = (1 << 31) - 1
U64 = np.uint64


def seedrand(x: int) -> int:
    # Lehmer LCG used by Go's seeding, Schrage's method: x = 48271*x mod (2^31-1)
    A, Q, R = 48271, 44488, 3399
    hi, lo = divmod(x, Q)
    x = A * lo - R * hi
    if x < 0:
        x += M31
    return x


def srand_historic(seed: int, sh1: int, sh2: int) -> np.ndarray:
    """The gen_cooked.go-era seeding (shifts sh1/sh2, no cooked mixing)."""
    seed %= M31
    if seed < 0:
        seed += M31
    if seed == 0:
        seed = 89482311
    x = seed
    vec = np.zeros(LEN, dtype=np.int64)
    for i in range(-20, LEN):
        x = seedrand(x)
        if i >= 0:
            u = x << sh1
            x = seedrand(x)
            u ^= x << sh2
            x = seedrand(x)
            u ^= x
            vec[i] = u
    return vec.view(U64)


def polymul_mod(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Multiply polynomials (uint64 coeffs, wraparound) mod t^607 - t^334 - 1."""
    full = np.convolve(p, q)  # uint64 wraps
    # fold degrees 1212..607 down: t^d -> t^(d-273) + t^(d-607)
    for d in range(full.shape[0] - 1, LEN - 1, -1):
        c = full[d]
        full[d - TAP] += c
        full[d - LEN] += c
        full[d] = U64(0)
    out = np.zeros(LEN, dtype=U64)
    out[: min(LEN, full.shape[0])] = full[: min(LEN, full.shape[0])]
    return out


def poly_pow_t(n: int) -> np.ndarray:
    """t^n mod f(t)."""
    result = np.zeros(LEN, dtype=U64)
    result[0] = U64(1)
    base = np.zeros(LEN, dtype=U64)
    base[1] = U64(1)
    while n:
        if n & 1:
            result = polymul_mod(result, base)
        n >>= 1
        if n:
            base = polymul_mod(base, base)
    return result


def mul_by_t(p: np.ndarray) -> np.ndarray:
    c = p[LEN - 1]
    out = np.empty(LEN, dtype=U64)
    out[1:] = p[:-1]
    out[0] = c
    out[TAP + (LEN - TAP) - TAP] = out[334] + U64(0)  # no-op clarity
    out[334] += c
    return out


def jump(vec0: np.ndarray, nsteps: int) -> np.ndarray:
    """State vector (Go vec layout) after nsteps ALFG steps from vec0."""
    # Go vec layout <-> sequence y: y_k (k=0..606) holds x_{k-606};
    # vec[i] = y_{333-i} for i<=333 else y_{940-i}.
    y = np.empty(LEN, dtype=U64)
    idx = np.arange(LEN)
    y[np.where(idx <= 333, 333 - idx, 940 - idx)] = vec0
    p = poly_pow_t(nsteps)  # gives y_{nsteps}
    vals = np.empty(LEN, dtype=U64)  # y_{N}..y_{N+606}  == x_{N-606}..x_N
    for m in range(LEN):
        vals[m] = U64(np.sum(p * y, dtype=U64))
        if m < LEN - 1:
            p = mul_by_t(p)
    # x_n -> vec position (334-n) mod 607, for n in [N-606, N]
    out = np.empty(LEN, dtype=U64)
    N = nsteps
    for i in range(LEN):
        n = N - ((N - 334 + i) % LEN)
        out[i] = vals[n - (N - 606)]
    return out


# ---- Go rng.go Seed + Uint64, parameterised by candidate cooked table ----

def go_seed(seed: int, cooked: np.ndarray, sh1: int, sh2: int):
    seed %= M31
    if seed < 0:
        seed += M31
    if seed == 0:
        seed = 89482311
    x = seed
    vec = np.zeros(LEN, dtype=U64)
    ck = cooked.view(U64)
    for i in range(-20, LEN):
        x = seedrand(x)
        if i >= 0:
            u = x << sh1
            x = seedrand(x)
            u ^= x << sh2
            x = seedrand(x)
            u ^= x
            u ^= int(ck[i])
            vec[i] = U64(u & 0xFFFFFFFFFFFFFFFF)
    return vec


def first_int63s(vec: np.ndarray, n: int):
    vec = vec.copy()
    tap, feed = 0, FEEDGAP
    out = []
    for _ in range(n):
        tap = (tap - 1) % LEN
        feed = (feed - 1) % LEN
        x = U64(vec[feed] + vec[tap])
        vec[feed] = x
        out.append(int(x) & ((1 << 63) - 1))
    return out


EXPECT = [5577006791947779410, 8674665223082153551, 6129484611666145821]

if __name__ == "__main__":
    found = None
    # candidate variants: historic srand shifts, step counts, masking
    for nsteps in (7_800_000_000_000,):
        for (s1, s2) in ((20, 10), (40, 20)):
            for mask63 in (False, True):
                vec0 = srand_historic(1, s1, s2)
                cooked = jump(vec0, nsteps)
                if mask63:
                    cooked = cooked & U64((1 << 63) - 1)
                # Seed() in rng.go uses shifts 40/20
                st = go_seed(1, cooked, 40, 20)
                got = first_int63s(st, 3)
                tag = f"N={nsteps} srand_shifts=({s1},{s2}) mask63={mask63}"
                print(tag, "->", got[:2])
                if got == EXPECT:
                    print("MATCH:", tag)
                    print("cooked[0] as int64:", cooked.view(np.int64)[0])
                    found = cooked
                    break
            if found is not None:
                break
        if found is not None:
            break
    if found is None:
        raise SystemExit("no variant matched known Go outputs")
    np.save("/root/repo/hulk_tpu/hashes/_data/rng_cooked.npy", found.view(np.int64))
    print("saved rng_cooked.npy")
