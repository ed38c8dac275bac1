"""Pure-Python oracle implementing the reference minimizer scan literally
(monotonic queue, rolling k-mers, set dedup) for differential testing of the
vectorised op. Follows src/minimizer/minimizer.go:96-204 step by step using
arbitrary-precision ints masked to 64 bits."""
from collections import deque

U64 = 0xFFFFFFFFFFFFFFFF

SEQ_NT4 = {}
for b, c in [("A", 0), ("a", 0), ("C", 1), ("c", 1), ("G", 2), ("g", 2),
             ("T", 3), ("t", 3), ("U", 3), ("u", 3)]:
    SEQ_NT4[ord(b)] = c


def hash64(key: int, mask: int) -> int:
    key = (((~key) & U64) + (key << 21)) & mask
    key = key ^ (key >> 24)
    key = ((key + (key << 3)) + (key << 8)) & mask
    key = key ^ (key >> 14)
    key = ((key + (key << 2)) + (key << 4)) & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & mask
    return key


def minimizers_of(seq: bytes, k: int, w: int) -> set:
    """Distinct minimizer values of one read; raises like the reference on
    short input."""
    n = len(seq)
    if n < 1 or n < w + k - 1:
        raise ValueError("sequence length must be >= w + k - 1")
    fwd = 0
    rc = 0
    bitmask = (1 << (2 * k)) - 1
    bitshift = 2 * (k - 1)
    q = deque()  # (X, pos)
    sketch = set()
    for i in range(n):
        window_index = i - w + 1
        c = SEQ_NT4.get(seq[i], 4)
        span = window_index + 1 if (window_index + 1) < k else k
        fwd = ((fwd << 2) | c) & bitmask
        rc = (rc >> 2) | (((3 ^ c) << bitshift) & U64)
        rc &= U64
        if i < k - 1:
            continue
        if fwd == rc:
            continue
        kmer = rc if fwd > rc else fwd
        # uint64(int32 span): sign-extend
        span_u = span & U64 if span >= 0 else (span + (1 << 64))
        x = ((hash64(kmer, bitmask) << 8) & U64) | (span_u & U64)
        x &= U64
        if q:
            while q and not (q[0][1] > (i - w)):
                q.popleft()
            while q and not (q[-1][0] < x):
                q.pop()
        q.append((x, i))
        if window_index >= 0:
            sketch.add(q[0][0])
    return sketch
