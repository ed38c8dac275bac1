"""Benchmark: streaming sketch throughput (reads/s/chip) on the default
backend (real TPU under the driver; CPU if forced).

Workload: BASELINE.json config — k=21, s=42, 150 bp synthetic reads,
spectrum = 21^4 bins. Measures the full device streaming step (minimizer
extraction + jump-hash binning + histogram accumulate, donated carry) plus
one final exact host flush, i.e. everything `hulk sketch` does per read.

Baseline: the reference repo publishes no v1.0.0 throughput numbers and no Go
toolchain exists in this image to measure one (BASELINE.md). The denominator
used here is 20,000 reads/s — a deliberately generous single-core Go HULK
estimate derived from the paper's ~2 min/sample anchor (~1-5 M reads/sample,
paper/genome-science-2018-abstract.md) and the per-base work in the Go hot
loop; it is ~2-6 Mbp/s, at the optimistic end of single-thread Go parsing+
hashing+map-insert throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

GO_BASELINE_READS_PER_S = 20_000.0

K, W, S = 21, 9, 42
NBINS = K ** 4
R, L = 8192, 160
N_STEPS = 120  # ~1M reads through one flush cycle, as in streaming use
READ_LEN = 150


def main() -> None:
    import jax
    import jax.numpy as jnp

    import hulk_tpu._jax_config  # noqa: F401
    from hulk_tpu.ops.device_step import sketch_accumulate_step
    from hulk_tpu.sketch.spectrum import KmerSpectrum

    backend = jax.default_backend()
    rng = np.random.default_rng(0)

    def batch(seed):
        r = np.random.default_rng(seed)
        codes = r.integers(0, 4, (R, L), dtype=np.uint8)
        codes[:, READ_LEN:] = 5
        lengths = np.full(R, READ_LEN, dtype=np.int32)
        return codes, lengths

    codes, lengths = batch(0)
    dev_codes = jax.device_put(codes)
    dev_lengths = jax.device_put(lengths)

    # correctness precheck: device histogram must bit-match the host path
    small = 64
    hist0 = jnp.zeros((NBINS,), dtype=jnp.int32)
    h_dev, n_dev = sketch_accumulate_step(
        hist0, dev_codes[:small], dev_lengths[:small], k=K, w=W
    )
    from hulk_tpu.ops.minimizer import minimizer_scan

    vals, mask = minimizer_scan(codes[:small], lengths[:small], k=K, w=W)
    host = KmerSpectrum(NBINS)
    host.add_hashes(np.asarray(vals)[np.asarray(mask)])
    exact = bool(np.array_equal(np.asarray(h_dev).astype(np.float64), host.bins))

    from hulk_tpu.ops.device_step import (
        bin_scatter_slice,
        live_bucket,
        minimizer_sorted_flat,
    )

    def stream_step(hist, codes_d, lengths_d):
        svals, cnt = minimizer_sorted_flat(codes_d, lengths_d, k=K, w=W)
        b = live_bucket(int(cnt), R * L, R)
        return bin_scatter_slice(hist, svals[:b])

    def stream_many(hist, batches):
        """Software-pipelined: keep the next batch's scan in flight while the
        current batch's live count is read back, hiding the sync."""
        inflight = []
        bi = 0
        for codes_d, lengths_d in batches[: 2]:
            inflight.append(minimizer_sorted_flat(codes_d, lengths_d, k=K, w=W))
        for i in range(len(batches)):
            if i + 2 < len(batches):
                c_d, l_d = batches[i + 2]
                inflight.append(minimizer_sorted_flat(c_d, l_d, k=K, w=W))
            svals, cnt = inflight[i]
            b = live_bucket(int(cnt), R * L, R)
            hist = bin_scatter_slice(hist, svals[:b])
        return hist

    # warmup (compile + host flush buffer pools)
    hist = jnp.zeros((NBINS,), dtype=jnp.int32)
    hist = stream_step(hist, dev_codes, dev_lengths)
    jax.block_until_ready(hist)
    from hulk_tpu.hashes.cws import get_cws_tables
    from hulk_tpu.sketch.histosketch import HistoSketch

    tables = get_cws_tables(S, NBINS)
    warm_hs = HistoSketch(K, S, NBINS, 1.0, tables=tables)
    wb = np.asarray(hist).astype(np.float64)
    wi = np.nonzero(wb)[0].astype(np.int64)
    warm_hs.add_elements(wi, wb[wi])

    t0 = time.perf_counter()
    batches = [(dev_codes, dev_lengths)] * N_STEPS
    hist = stream_many(hist, batches)
    count = R * N_STEPS
    jax.block_until_ready(hist)
    t_stream = time.perf_counter() - t0

    # final exact flush on host (part of the end-to-end sketch cost)
    t1 = time.perf_counter()
    hb = np.asarray(hist).astype(np.float64)
    ids = np.nonzero(hb)[0].astype(np.int64)
    hs = HistoSketch(K, S, NBINS, 1.0, tables=tables)
    hs.add_elements(ids, hb[ids])
    t_flush = time.perf_counter() - t1

    print(
        f"# stream: {t_stream:.2f}s ({count} reads), flush: {t_flush:.2f}s "
        f"({ids.shape[0]} bins)",
        file=sys.stderr,
    )
    reads_per_s = count / (t_stream + t_flush)
    result = {
        "metric": f"reads/s/chip (sketch k={K} s={S}, {READ_LEN}bp, backend={backend}, exact_histogram={exact})",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / GO_BASELINE_READS_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
