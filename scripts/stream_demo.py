"""BASELINE config 4 demo: streaming sketch with interval flushes + concept
drift over a 10M-read mock microbiome, single host + one chip.

Streams synthetic 150bp reads through the device path with interval=1M and
decayRatio=0.9, printing per-interval throughput. Usage:

    python scripts/stream_demo.py [n_reads] [interval]
"""
import sys
import time

import numpy as np


def main(n_reads=10_000_000, interval=1_000_000):
    import jax
    import jax.numpy as jnp

    import hulk_tpu._jax_config  # noqa: F401
    from hulk_tpu.hashes.cws import get_cws_tables
    from hulk_tpu.ops.device_step import (
        bin_scatter_slice,
        live_bucket,
        minimizer_sorted_flat,
    )
    from hulk_tpu.sketch.histosketch import HistoSketch
    from hulk_tpu.sketch.spectrum import KmerSpectrum

    K, W, S = 21, 9, 42
    NBINS = K ** 4
    R, L, READ_LEN = 8192, 160, 150
    DECAY = 0.9

    print(f"backend={jax.default_backend()} reads={n_reads} interval={interval} decay={DECAY}")
    tables = get_cws_tables(S, NBINS)
    hs = HistoSketch(K, S, NBINS, DECAY, tables=tables)
    spectrum = KmerSpectrum(NBINS)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (R, L), dtype=np.uint8)
    codes[:, READ_LEN:] = 5
    lengths = np.full(R, READ_LEN, dtype=np.int32)
    dc, dl = jax.device_put(codes), jax.device_put(lengths)

    hist = jnp.zeros(NBINS, dtype=jnp.int32)
    # warmup/compile
    sv, cnt = minimizer_sorted_flat(dc, dl, k=K, w=W)
    hist = bin_scatter_slice(hist, sv[: live_bucket(int(cnt), R * L, R)])
    jax.block_until_ready(hist)
    hist = jnp.zeros(NBINS, dtype=jnp.int32)

    t0 = time.perf_counter()
    done = 0
    next_flush = interval
    t_int = time.perf_counter()
    while done < n_reads:
        sv, cnt = minimizer_sorted_flat(dc, dl, k=K, w=W)
        hist = bin_scatter_slice(hist, sv[: live_bucket(int(cnt), R * L, R)])
        done += R
        if done >= next_flush or done >= n_reads:
            jax.block_until_ready(hist)
            hb = np.asarray(hist).astype(np.float64)
            ids = np.nonzero(hb)[0].astype(np.int64)
            tf = time.perf_counter()
            hs.add_elements(ids, hb[ids])
            hist = jnp.zeros(NBINS, dtype=jnp.int32)
            now = time.perf_counter()
            print(
                f"  interval @{done:>9d}: {interval/(now-t_int):,.0f} reads/s "
                f"(flush {now-tf:.2f}s, {ids.shape[0]} bins)"
            )
            t_int = now
            next_flush += interval
    total = time.perf_counter() - t0
    print(f"TOTAL: {done} reads in {total:.1f}s = {done/total:,.0f} reads/s")
    print(f"sketch mins[:6]: {hs.get_sketch()[:6].tolist()}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    i = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    main(n, i)
