"""Blockwise minimizer extraction for reads of unbounded length.

The reference streams sequences of any length through its rolling scan
(src/minimizer/minimizer.go:62-76 checks only len >= w+k-1; FASTA mode
exists precisely for contigs/assemblies, cmd/sketch.go:51). The batched
device pipeline, by contrast, works on fixed [R, L] shapes — a 10 Mb contig
must NOT become a [R, 10M] tensor.

This module chunks one long read into fixed-width blocks with a
(w + k - 1)-base overlap halo and scans them with the same vectorised
window op, exactly:

  * block 0 is a normal scan (span ramp + w-1 report ramp at the read
    start are genuine);
  * blocks b >= 1 start at global offset b*(S-H) (H = w+k-1) and run the
    `cont=True` variant (span saturated at k, reporting from local
    position H) — the halo makes every reported window's entries
    bit-identical to the in-context values (derivation in
    ops/minimizer.minimizer_window's docstring);
  * reported values from all blocks union (np.unique) into the read's
    distinct minimizer set, the reference's per-read semantics
    (minimizer.go:188-198).

Memory is O(group * block) on device and O(L) u8 on host, independent of
read length. Differentially tested against the literal Go oracle on 1 Mb
constructions (tests/test_longread.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import hulk_tpu._jax_config  # noqa: F401
from hulk_tpu.ops.minimizer import minimizer_window

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

# block width S and blocks per device dispatch: [GROUP, BLOCK] u64
# intermediates are ~17 MB — far below any device memory budget, wide
# enough that the per-dispatch overhead amortises
DEFAULT_BLOCK = 1 << 16
DEFAULT_GROUP = 16


@partial(jax.jit, static_argnames=("k", "w", "cont"))
def _block_distinct(codes, lengths, *, k: int, w: int, cont: bool):
    """Per-block sorted distinct reported values (U64MAX padded)."""
    wmin, report = minimizer_window(codes, lengths, k=k, w=w, cont=cont)
    vals = jnp.where(report, wmin, _U64MAX)
    svals = jnp.sort(vals, axis=1)
    neq = jnp.concatenate(
        [jnp.ones_like(svals[:, :1], dtype=bool), svals[:, 1:] != svals[:, :-1]],
        axis=1,
    )
    return jnp.where(neq, svals, _U64MAX)


def long_read_minimizers(
    codes: np.ndarray,
    *,
    k: int,
    w: int,
    block: int = DEFAULT_BLOCK,
    group: int = DEFAULT_GROUP,
) -> np.ndarray:
    """Distinct minimizer values (sorted uint64) of ONE read of any length.

    codes: [L] uint8 base codes (0-4, the parser alphabet). Works for any
    L >= w + k - 1 and is bit-identical to scanning the read in one piece;
    engaged by the pipeline for reads beyond the batched path's length
    cap. Blocks are scanned in fixed-shape [group, block] dispatches so
    XLA compiles exactly twice (block 0's shape + the cont shape).
    """
    L = int(codes.shape[0])
    if L < w + k - 1:
        raise ValueError("sequence length must be >= w + k - 1")
    H = w + k - 1
    S = block
    if S <= H:
        raise ValueError(f"block must exceed the halo w+k-1 ({H})")

    pieces: list[np.ndarray] = []

    def run(rows: np.ndarray, lens: np.ndarray, cont: bool) -> None:
        out = np.asarray(
            _block_distinct(rows, lens, k=k, w=w, cont=cont)
        ).reshape(-1)
        pieces.append(out[out != _U64MAX])

    # block 0 (the read start: genuine span/report ramps)
    first = np.full((1, S), 5, dtype=np.uint8)
    n0 = min(L, S)
    first[0, :n0] = codes[:n0]
    run(first, np.array([n0], dtype=np.int32), cont=False)

    # continuation blocks at stride S-H; only blocks with length > H can
    # report (their windows start at local H)
    stride = S - H
    starts = [g for g in range(stride, L - H, stride)]
    for i in range(0, len(starts), group):
        batch = starts[i : i + group]
        rows = np.full((group, S), 5, dtype=np.uint8)
        lens = np.zeros(group, dtype=np.int32)
        for j, g0 in enumerate(batch):
            n = min(L - g0, S)
            rows[j, :n] = codes[g0 : g0 + n]
            lens[j] = n
        run(rows, lens, cont=True)

    if not pieces:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(pieces))
