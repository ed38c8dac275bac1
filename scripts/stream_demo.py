"""BASELINE config 4 demo: streaming sketch with interval flushes + concept
drift over a 10M-read mock microbiome, single host + one chip.

Drives the PRODUCTION pipeline machinery (the fused sync-free device stream
+ background-overlapped exact host flush — the same code `hulk sketch` runs)
with interval=1M and decayRatio=0.9, printing per-interval throughput.

    python scripts/stream_demo.py [n_reads] [interval]
"""
import sys
import time

import numpy as np


def main(n_reads=10_000_000, interval=1_000_000):
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    import hulk_tpu._jax_config  # noqa: F401
    from hulk_tpu.hashes.cws import get_cws_tables
    from hulk_tpu.ops.device_step import (
        compact_default,
        pallas_supported,
        sketch_stream_step_fused,
        stream_bucket,
    )
    from hulk_tpu.sketch.histosketch import HistoSketch
    from hulk_tpu.sketch.spectrum import KmerSpectrum

    K, W, S = 21, 9, 42
    NBINS = K ** 4
    R, L, READ_LEN = 16384, 160, 150  # production batch shape (round 5)
    DECAY = 0.9
    PALLAS = pallas_supported()
    COMPACT = compact_default()
    BUCKET = stream_bucket(R, R * L, l=L, k=K, w=W)

    print(f"backend={jax.default_backend()} reads={n_reads} interval={interval} decay={DECAY} pallas={PALLAS}")
    tables = get_cws_tables(S, NBINS)
    hs = HistoSketch(K, S, NBINS, DECAY, tables=tables)
    spectrum = KmerSpectrum(NBINS)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (R, L), dtype=np.uint8)
    codes[:, READ_LEN:] = 5
    lengths = np.full(R, READ_LEN, dtype=np.int32)
    dc, dl = jax.device_put(codes), jax.device_put(lengths)

    def step(hist, count):
        hist, count, _ = sketch_stream_step_fused(
            hist, count, dc, dl, k=K, w=W, bucket=BUCKET, pallas=PALLAS,
            compact=COMPACT,
        )
        return hist, count

    hist = jnp.zeros(NBINS, dtype=jnp.int32)
    count = jnp.zeros((), dtype=jnp.int64)
    hist, count = step(hist, count)
    jax.block_until_ready(hist)  # compile
    hist = jnp.zeros(NBINS, dtype=jnp.int32)
    count = jnp.zeros((), dtype=jnp.int64)
    # flush warmup (native build + buffer pools)
    warm = HistoSketch(K, S, NBINS, DECAY, tables=tables)
    warm.add_elements(np.arange(2500, dtype=np.int64), np.ones(2500))

    pool = ThreadPoolExecutor(1)
    pending = None

    def flush(hb):
        ids = np.nonzero(hb)[0].astype(np.int64)
        t0 = time.perf_counter()
        hs.add_elements(ids, hb[ids])
        return time.perf_counter() - t0, ids.shape[0]

    t0 = time.perf_counter()
    done = 0
    next_flush = interval
    t_int = time.perf_counter()
    flush_wait = 0.0
    while done < n_reads:
        hist, count = step(hist, count)
        done += R
        if done >= next_flush or done >= n_reads:
            hb = np.asarray(hist).astype(np.float64)  # device sync
            hist = jnp.zeros(NBINS, dtype=jnp.int32)
            tw = time.perf_counter()
            if pending is not None:
                tf, nb = pending.result()  # prior flush must finish first
            flush_wait += time.perf_counter() - tw
            pending = pool.submit(flush, hb)
            now = time.perf_counter()
            print(
                f"  interval @{done:>9d}: {interval/(now-t_int):,.0f} reads/s "
                f"(flush overlapped; waited {time.perf_counter()-tw:.2f}s)"
            )
            t_int = now
            next_flush += interval
    tf, nb = pending.result()
    total = time.perf_counter() - t0
    print(
        f"TOTAL: {done} reads in {total:.1f}s = {done/total:,.0f} reads/s "
        f"(drift flushes: last {tf:.2f}s/{nb} bins; total flush wait {flush_wait:.2f}s)"
    )
    print(f"sketch mins[:6]: {hs.get_sketch()[:6].tolist()}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    i = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    main(n, i)
