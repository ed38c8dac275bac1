"""Device-step variant microbenchmark (VERDICT r4 item 3).

Measures the PRODUCTION grouped stream step (one flat transfer, one
lax.scan dispatch per group) under the chained-dispatch method
(docs/PERF.md "Measurement method") across the candidate optimisations:

  * compact=False/True — per-row sort compaction before the global key
    sort (ops/device_step.stream_step_fused_body);
  * R = 8192 / 16384 — reads per sub-batch (k=21 packs read ids up to
    R=16384: 2k+8+14 = 64 bits exactly), amortising fixed per-kernel costs.

Usage: python scripts/step_variants.py [n_groups]
Prints reads/s for each variant; run on the real chip.
"""
import sys
import time

import numpy as np

K, W = 21, 9
NBINS = K ** 4
L, READ_LEN = 160, 150
G = 8  # sub-batches per group dispatch


def measure(R: int, compact: bool, n_groups: int) -> float:
    import jax
    import jax.numpy as jnp

    from hulk_tpu.ops.device_step import (
        build_group_buffer,
        fused_bits_ok,
        pallas_supported,
        sketch_stream_group_step,
        stream_bucket,
    )

    assert fused_bits_ok(K, R), (K, R)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (R, L), dtype=np.uint8)
    codes[:, READ_LEN:] = 5
    lengths = np.full(R, READ_LEN, dtype=np.int32)
    flat = build_group_buffer([codes] * G, [lengths] * G)
    dflat = jax.device_put(flat)
    pallas = pallas_supported()
    kw = dict(
        g=G, r=R, l=L, k=K, w=W,
        bucket=stream_bucket(R, R * L, l=L, k=K, w=W),
        pallas=pallas, compact=compact,
    )

    def carries():
        return (
            jnp.zeros(NBINS, dtype=jnp.int32),
            jnp.zeros((), dtype=jnp.int64),
            jnp.full(1, 2**64 - 1, dtype=jnp.uint64),
            jnp.full(1, 2**64 - 1, dtype=jnp.uint64),
            jnp.zeros(1, dtype=jnp.uint64),
        )

    st = carries()
    st = sketch_stream_group_step(*st, dflat, **kw)
    _ = np.asarray(st[0])  # compile + settle

    st = carries()
    t0 = time.perf_counter()
    for _ in range(n_groups):
        st = sketch_stream_group_step(*st, dflat, **kw)
    _ = np.asarray(st[0])  # force the chain
    dt = time.perf_counter() - t0
    return n_groups * G * R / dt


def main() -> None:
    import jax

    import hulk_tpu._jax_config  # noqa: F401

    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    print(f"# backend={jax.default_backend()} groups={n_groups} G={G}")
    base = None
    for R in (8192, 16384):
        for compact in (False, True):
            rate = measure(R, compact, n_groups)
            if base is None:
                base = rate
            print(
                f"R={R:5d} compact={int(compact)}  {rate:12,.0f} reads/s "
                f"({rate / base:.3f}x baseline)"
            )


if __name__ == "__main__":
    main()
