"""The `hulk` command line: sketch | smash | version (+ index, extension).

Flag names, shorthands and defaults mirror the reference CLI exactly
(cmd/root.go:61-67, cmd/sketch.go:49-62, cmd/smash.go:52-59) so scripts
written against Go HULK run unchanged.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time

from hulk_tpu.version import HULK_COMPAT_VERSION

log = logging.getLogger("hulk")

_EXTS = ["fastq", "fq", "fasta", "fna", "fa"]


def _default_outfile() -> str:
    return "./hulk-" + time.strftime("%Y%m%d%H%M%S")


def _setup_log(log_file: str | None) -> None:
    # Go's log package format: "2009/01/23 01:23:23 message"
    handler = (
        logging.FileHandler(log_file) if log_file else logging.StreamHandler(sys.stdout)
    )
    handler.setFormatter(
        logging.Formatter(fmt="%(asctime)s %(message)s", datefmt="%Y/%m/%d %H:%M:%S")
    )
    log.handlers.clear()
    log.addHandler(handler)
    log.setLevel(logging.INFO)


def _error_check(msg: str) -> None:
    log.error("ERROR---> %s", msg)
    raise SystemExit(1)


def _add_global_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("-k", "--kmerSize", type=int, default=21, help="minimizer k-mer length")
    p.add_argument(
        "-o", "--outFile", type=str, default=_default_outfile(),
        help="directory and basename for saving the outfile(s)",
    )
    p.add_argument("--log", dest="log_file", type=str, default="", help="filename for log file")
    p.add_argument("-p", "--processors", type=int, default=1, help="number of processors to use")
    p.add_argument("--profiling", action="store_true", help="write a JAX profiler trace")


def build_parser() -> argparse.ArgumentParser:
    root = argparse.ArgumentParser(prog="hulk", description="Histosketching Using Little Kmers (TPU-native)")
    sub = root.add_subparsers(dest="subcommand")

    ps = sub.add_parser("sketch", help="Create a sketch from a set of reads")
    _add_global_flags(ps)
    ps.add_argument("-f", "--fastq", action="append", default=[], help="FASTQ file(s) to sketch (can also pipe in STDIN)")
    ps.add_argument("--fasta", action="store_true", help="input is FASTA format")
    ps.add_argument("-w", "--windowSize", type=int, default=9, help="minimizer window size")
    ps.add_argument("-i", "--interval", type=int, default=0, help="size of k-mer sampling interval (0 = no interval; single-process only — multi-host runs shard whole files and cannot see the global read order)")
    ps.add_argument("-s", "--sketchSize", type=int, default=50, help="size of sketch")
    ps.add_argument("-x", "--decayRatio", type=float, default=1.0, help="decay ratio used for concept drift (1.0 = disabled)")
    ps.add_argument("--stream", action="store_true", help="print sketches to STDOUT after every interval (log redirected to disk; snapshots carry the histosketch only unless --streamAll)")
    ps.add_argument("--streamAll", dest="stream_all", action="store_true", help="with --stream: interval snapshots also carry the KMV/KHF/HMH signatures (extension; costs one device-state sync per interval)")
    ps.add_argument("-b", "--bannerLabel", type=str, default="blank", help="adds a label to the sketch object, for use with BANNER")
    ps.add_argument("--khf", action="store_true", help="also generate a MinHash K-Hash Functions sketch")
    ps.add_argument("--kmv", action="store_true", help="also generate a MinHash K-Minimum Values (bottom-k) sketch")
    ps.add_argument("--hmh", "--hyperminhash", dest="hmh", action="store_true", help="also generate a HyperMinHash sketch (extension)")
    ps.add_argument("--deviceFlush", "--device-flush", dest="device_flush", action="store_true", help="run the histosketch flush on the accelerator (extension; exact output, requires decayRatio=1.0 — the drift scan's threshold evolves mid-flush and stays on the host)")
    ps.add_argument("--checkpoint", type=str, default="", help="write a resumable state snapshot after every interval flush (extension; requires -i, single-process only)")
    ps.add_argument("--resume", type=str, default="", help="resume a sketch run from a --checkpoint snapshot (extension)")

    pm = sub.add_parser("smash", help="Smash a bunch of sketches and return a distance matrix")
    _add_global_flags(pm)
    pm.add_argument("-d", "--sketchDir", type=str, default="./", help="the directory containing the sketches to smash")
    pm.add_argument("--recursive", action="store_true", help="recursively search the supplied sketch directory")
    pm.add_argument("-a", "--algorithm", type=str, default="histosketch", help="which sketching algorithm to use [histosketch, kmv, khf]")
    pm.add_argument("-m", "--metric", type=str, default="jaccard", help="which distance metric to use [jaccard, weightedjaccard]")
    pm.add_argument("--bannerMatrix", action="store_true", help="write a matrix file for banner")

    pi = sub.add_parser("index", help="Create or search an LSH Forest index of histosketches")
    _add_global_flags(pi)
    pi.add_argument("-r", "--run", type=str, required=True, help="index operation [create, add, search]")
    pi.add_argument("-n", "--indexName", type=str, required=True, help="index file name")
    pi.add_argument("-j", "--jsThresh", type=float, default=0.90, help="Jaccard similarity threshold for search")
    pi.add_argument("-d", "--sketchDir", type=str, default="./", help="directory containing sketches to index/query")
    pi.add_argument("--recursive", action="store_true", help="recursively search the supplied sketch directory")
    pi.add_argument("-s", "--sketchSize", type=int, default=50, help="sketch size the index holds")

    pp = sub.add_parser("print", help="print sketch values as CSV rows (v0.0.2 surface)")
    _add_global_flags(pp)
    pp.add_argument("-f", "--file", action="append", default=[], required=True, help="sketch JSON file(s) to print")
    pp.add_argument("-a", "--algorithm", type=str, default="histosketch", help="which sketch to print [histosketch, kmv, khf]")

    pd = sub.add_parser("distance", help="distance between two sketches (v0.0.2 surface)")
    _add_global_flags(pd)
    pd.add_argument("-f", "--file", action="append", default=[], required=True, help="exactly two sketch JSON files")
    pd.add_argument("-a", "--algorithm", type=str, default="histosketch", help="which sketching algorithm to use [histosketch, kmv, khf]")
    pd.add_argument("-m", "--metric", type=str, default="jaccard", help="which distance metric to use [jaccard, weightedjaccard]")

    pv = sub.add_parser("version", help="prints current version and exits")
    _add_global_flags(pv)

    return root


# ---- sketch ---------------------------------------------------------------

def _split_fastq_args(vals: list[str]) -> list[str]:
    out: list[str] = []
    for v in vals:
        out.extend([x for x in v.split(",") if x])
    return out


def run_sketch(args) -> None:
    from hulk_tpu.stream.fastq import stream_reads
    from hulk_tpu.stream.pipeline import PipelineError, SketchConfig, run_sketch_pipeline

    if args.stream and not args.log_file:
        args.log_file = args.outFile + ".log"
    _setup_log(args.log_file or None)

    start = time.time()
    log.info("this is hulk (version %s)", HULK_COMPAT_VERSION)
    log.info("please cite Rowe et al. 2019, doi: https://doi.org/10.1186/s40168-019-0653-2")
    log.info("starting the sketch subcommand")
    log.info("checking parameters...")

    fastq = _split_fastq_args(args.fastq)

    # sketchParamCheck (cmd/sketch.go:185-214)
    out_dir = os.path.dirname(args.outFile)
    if out_dir and out_dir != ".":
        os.makedirs(out_dir, mode=0o700, exist_ok=True)
    nproc = os.cpu_count() or 1
    if args.processors <= 0 or args.processors > nproc:
        args.processors = nproc
    from hulk_tpu import native as _native

    _native.set_threads(args.processors)
    if not fastq:
        if sys.stdin.isatty():
            _error_check("no STDIN found")
        log.info("\tinput file: using STDIN")
    else:
        for f in fastq:
            if not os.path.exists(f):
                _error_check(f"file does not exist: {f}")
            parts = f.split(".")
            idx = -2 if parts[-1] == "gz" else -1
            if parts[idx] not in _EXTS:
                _error_check(f"file does not have recognised extension: {f}")

    log.info("\tmode: %s", "FASTA" if args.fasta else "FASTQ")
    log.info("\tno. processors: %d", args.processors)
    log.info("\tminimizer k-mer size: %d", args.kmerSize)
    log.info("\tminimizer window size: %d", args.windowSize)
    log.info("\tsketch size: %d", args.sketchSize)
    log.info("\tstreaming: %s", "enabled" if args.stream else "disabled")
    if args.decayRatio == 1:
        log.info("\tconcept drift: disabled")
    else:
        log.info("\tconcept drift: enabled")
        log.info("\tdecay ratio: %.2f", args.decayRatio)
    spectrum_size = args.kmerSize ** 4
    log.info("\tnumber of bins in k-mer spectrum: %d", spectrum_size)
    log.info("\tadding KHF sketch: %s", str(args.khf).lower())
    log.info("\tadding KMV sketch: %s", str(args.kmv).lower())
    if args.hmh:
        log.info("\tadding HyperMinHash sketch: true")

    cfg = SketchConfig(
        kmer_size=args.kmerSize,
        window_size=args.windowSize,
        sketch_size=args.sketchSize,
        spectrum_size=spectrum_size,
        decay_ratio=args.decayRatio,
        interval=args.interval,
        fasta=args.fasta,
        kmv=args.kmv,
        khf=args.khf,
        hmh=args.hmh,
        banner_label=args.bannerLabel,
        file_name=(",".join(fastq) + ",") if fastq else "STDIN",
        checkpoint_path=args.checkpoint or None,
        resume_from=args.resume or None,
        device_flush=args.device_flush,
        interval_secondary=args.stream_all,
    )

    # multi-host: each process takes a static file shard; partial states are
    # merged exactly at the end (pipeline) and process 0 writes the output
    import jax

    if jax.process_count() > 1:
        from hulk_tpu.parallel.distributed import process_read_shard

        if not fastq:
            _error_check("multi-host runs require file inputs (no STDIN)")
        all_files = fastq
        fastq = process_read_shard(fastq)
        cfg.file_name = ",".join(all_files) + ","
        log.info(
            "\tmulti-host: process %d/%d takes %d of %d files",
            jax.process_index(), jax.process_count(), len(fastq), len(all_files),
        )

    # backend-stall watchdog (stream/watchdog.py): probe the device data
    # path before consuming input; a wedged tunnel connection re-execs the
    # process (fresh connection) instead of hanging forever. Re-exec is
    # only transparent for single-process, file-input runs.
    from hulk_tpu.stream.watchdog import guard_backend

    guard_backend(log, allow_reexec=bool(fastq) and jax.process_count() == 1)

    log.info("initialising sketching pipeline...")
    log.info("finding minimizers...")
    from hulk_tpu import native

    if fastq and native.available():
        # native C++ parser (FASTQ or FASTA) feeds fixed-shape batches directly
        cfg.input_paths = fastq
        reads = None
    elif not fastq and jax.process_count() > 1:
        # more processes than input files: this process's shard is empty. It
        # must still run the pipeline (the final merge is collective), but it
        # must NOT fall through to STDIN.
        reads = iter(())
    else:
        reads = stream_reads(fastq, fasta=args.fasta, stdin=None if fastq else sys.stdin.buffer)

    # --stream: print the sketch to STDOUT after every interval flush (the
    # documented reference behaviour, cmd/sketch.go:56 — unimplemented there;
    # its flag only redirected the log, which is replicated above).
    on_interval = None
    if args.stream and args.interval:
        def on_interval(snap):
            sys.stdout.buffer.write(snap.to_json_bytes())
            sys.stdout.buffer.write(b"\n")
            sys.stdout.buffer.flush()

    prof = None
    if args.profiling:
        import jax

        jax.profiler.start_trace("./hulk-profile")
        prof = True
    try:
        result = run_sketch_pipeline(reads, cfg, on_interval=on_interval)
    except PipelineError as e:
        _error_check(str(e))
        return
    except ValueError as e:
        _error_check(str(e))
        return
    finally:
        if prof:
            import jax

            jax.profiler.stop_trace()

    mean_rl = int(result.length_total / result.seq_count)
    log.info("\tprocessed %d sequences in total", result.seq_count)
    log.info("\tmean sequence length: %d", mean_rl)
    log.info("\tfound %d minimizers", result.minimizer_count)
    log.info("\thistosketching across %d bins", spectrum_size)
    log.info("cleaning up...")

    if jax.process_count() > 1 and jax.process_index() != 0:
        log.info("finished in %.6fs (output written by process 0)", time.time() - start)
        return
    result.hulk_data.write_json(args.outFile + ".json")
    log.info("\twritten sketch to disk: %s", args.outFile + ".json")
    if args.stream:
        sys.stdout.buffer.write(result.hulk_data.to_json_bytes())
        sys.stdout.buffer.write(b"\n")
    log.info("finished in %.6fs", time.time() - start)


# ---- smash ----------------------------------------------------------------

def run_smash(args) -> None:
    import csv

    from hulk_tpu.io.sketchio import (
        AVAIL_ALGORITHMS,
        SketchIOError,
        collect_jsons,
        load_hulk_data,
    )
    from hulk_tpu.sketch.distances import AVAIL_METRICS

    _setup_log(args.log_file or None)
    log.info("this is hulk (version %s)", HULK_COMPAT_VERSION)
    log.info("starting the smash subcommand")
    if args.profiling:  # reference wraps smash in a profile too (smash.go:65-69)
        import atexit

        import jax

        jax.profiler.start_trace("./hulk-profile")
        atexit.register(jax.profiler.stop_trace)

    if args.metric not in AVAIL_METRICS:
        _error_check(
            f"supplied distance metric is not available: {args.metric}\n"
            f"please select one of the following: {AVAIL_METRICS}"
        )
    if args.algorithm not in AVAIL_ALGORITHMS:
        _error_check(
            f"supplied algorithm not available: {args.algorithm}\n"
            f"please select one of the following: {AVAIL_ALGORITHMS}"
        )
    out_dir = os.path.dirname(args.outFile)
    if out_dir and out_dir != ".":
        os.makedirs(out_dir, mode=0o700, exist_ok=True)
    if not os.path.isdir(args.sketchDir):
        _error_check(f"directory does not exist: {args.sketchDir}")

    sketch_dir = args.sketchDir
    if not sketch_dir.endswith("/"):
        sketch_dir += "/"
    try:
        json_files = collect_jsons(sketch_dir, args.recursive)
    except SketchIOError as e:
        _error_check(str(e))
        return

    import jax

    # backend-stall watchdog (same rationale as run_sketch; smash's device
    # kernels hit the same data path). Inputs are files, so re-exec is
    # always transparent for single-process runs.
    from hulk_tpu.stream.watchdog import guard_backend

    guard_backend(log, allow_reexec=jax.process_count() == 1)

    # multi-host smash: shard the JSON loads round-robin, allgather the
    # [n_i, s] mins+weights, shard the matrix row blocks per process (each
    # over its local dp mesh), allgather the rows; process 0 writes. Only
    # the weighted-Jaccard histosketch path (the reference smash default)
    # distributes; other metric/algorithm combos fall back to
    # every-process-loads-everything with process-0-only writes.
    if (
        jax.process_count() > 1
        and args.metric == "weightedjaccard"
        and args.algorithm == "histosketch"
        and not args.bannerMatrix
        and len(json_files) >= 2
    ):
        _run_smash_distributed(args, sorted(json_files))
        return

    sketches = {}
    for jf in json_files:
        try:
            sketches[jf] = load_hulk_data(jf)
        except SketchIOError as e:
            _error_check(str(e))
            return
    if len(sketches) < 2:
        _error_check(
            f"{len(sketches)} sketches found in the supplied directory, HULK needs at least 2 to smash!"
        )

    log.info("checking parameters and collecting sketches...")
    log.info("\talgorithm: %s", args.algorithm)
    log.info("\tk-mer size: %d", args.kmerSize)
    log.info("\tcreate matrix for banner: %s", str(args.bannerMatrix).lower())
    log.info("\tnumber of sketch objects: %d", len(sketches))
    log.info("HULK SMASH!")

    ordering = sorted(sketches.keys())
    matrix_path = args.outFile + ".hulk-matrix.csv"

    # Large sketch piles use the blocked device kernel (the reference's
    # scalar N^2 loop is the smash hot spot, SURVEY.md §3.2); small piles
    # keep the host path whose summation order is reference-exact.
    device_matrix = None
    if len(ordering) > 64 and args.algorithm != "hyperminhash":
        try:
            device_matrix = _smash_matrix_device(
                sketches, ordering, args.metric, args.kmerSize, args.algorithm
            )
        except Exception as e:  # fall back to the host path on any failure
            log.info("\tdevice matrix path unavailable (%s); using host path", e)

    if jax.process_count() > 1 and jax.process_index() != 0:
        log.info("finished")  # only process 0 writes output files
        return
    with open(matrix_path, "w", newline="") as fh:
        wr = csv.writer(fh, lineterminator="\n")
        wr.writerow(ordering)
        if device_matrix is not None:
            for i in range(len(ordering)):
                wr.writerow([f"{100 - d * 100:.2f}" for d in device_matrix[i]])
        else:
            for f1 in ordering:
                row = []
                for f2 in ordering:
                    try:
                        d = sketches[f1].get_distance(
                            sketches[f2], args.metric, args.kmerSize, args.algorithm
                        )
                    except SketchIOError as e:
                        _error_check(str(e))
                        return
                    row.append(f"{100 - d * 100:.2f}")
                wr.writerow(row)
    log.info("\twritten similarity matrix to disk: %s", matrix_path)

    if args.bannerMatrix:
        banner_path = args.outFile + ".banner-matrix.csv"
        with open(banner_path, "w", newline="") as fh:
            wr = csv.writer(fh, lineterminator="\n")
            for f1 in ordering:
                try:
                    obj = sketches[f1].find_sketch(args.kmerSize, args.algorithm)
                except SketchIOError as e:
                    _error_check(str(e))
                    return
                row = [str(int(v)) for v in obj.get_sketch()]
                row.append(sketches[f1].banner)
                wr.writerow(row)
        log.info("\twritten banner matrix to disk: %s", banner_path)
    log.info("finished")


def _run_smash_distributed(args, ordering: list) -> None:
    """Multi-host weighted-Jaccard smash (see run_smash). Loads a
    round-robin shard of `ordering` per process, allgathers mins+weights,
    computes this process's row stripe on its local dp mesh, allgathers
    rows, host-rechecks %.2f boundary cells from the gathered arrays (the
    exact get_wjd with the reference's subject-weights semantics), and
    writes the byte-identical CSV from process 0."""
    import csv

    import jax
    import numpy as np

    from hulk_tpu.io.sketchio import (
        SketchIOError, _weights_of, load_hulk_data,
    )
    from hulk_tpu.parallel.distributed import process_read_shard
    from hulk_tpu.parallel.smash import distributed_pairwise_wjd
    from hulk_tpu.sketch.distances import get_wjd

    my_files = process_read_shard(ordering)
    local_mins, local_weights = [], []
    for jf in my_files:
        try:
            data = load_hulk_data(jf)
            obj = data.find_sketch(args.kmerSize, args.algorithm)
        except SketchIOError as e:
            _error_check(str(e))
            return
        local_mins.append(np.asarray(obj.get_sketch(), dtype=np.int64))
        local_weights.append(np.asarray(_weights_of(obj), dtype=np.float64))
    s = local_mins[0].shape[0] if local_mins else 0
    lm = np.stack(local_mins) if local_mins else np.zeros((0, s), np.int64)
    lw = (
        np.stack(local_weights) if local_weights else np.zeros((0, s), np.float64)
    )
    log.info(
        "\tprocess %d/%d: %d of %d sketches",
        jax.process_index(), jax.process_count(), len(my_files), len(ordering),
    )
    mins, weights, d = distributed_pairwise_wjd(lm, lw)
    if mins.shape[0] != len(ordering):
        _error_check("sketch shard gather lost rows")
        return

    # boundary-cell recheck, from the gathered arrays (subject-weights bug:
    # both weight vectors from the row sketch); margin covers the device
    # kernel's compensated-f32 error bound (ops/distance.wjd_recheck_margin)
    from hulk_tpu.ops.distance import wjd_recheck_margin

    cells = 100.0 - d * 100.0
    frac = np.abs(cells * 100.0 - np.floor(cells * 100.0) - 0.5)
    risky = np.argwhere(frac < wjd_recheck_margin(mins.shape[1]) * 10000.0)
    for i, j in risky:
        d[i, j] = get_wjd(mins[i], mins[j], weights[i], weights[i])
    if len(risky):
        log.info("\trechecked %d boundary cells on the host", len(risky))

    if jax.process_index() == 0:
        matrix_path = args.outFile + ".hulk-matrix.csv"
        with open(matrix_path, "w", newline="") as fh:
            wr = csv.writer(fh, lineterminator="\n")
            wr.writerow(ordering)
            for i in range(len(ordering)):
                wr.writerow([f"{100 - v * 100:.2f}" for v in d[i]])
        log.info("\twritten similarity matrix to disk: %s", matrix_path)
    log.info("finished")


def _apply_platform_env() -> None:
    """Honour JAX_PLATFORMS/HULK_PLATFORM even though this environment
    pre-imports jax at interpreter startup (which makes the env var a no-op
    for backend selection)."""
    plat = os.environ.get("HULK_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _smash_matrix_device(sketches, ordering, metric, ksize, algo):
    """[N, N] distance matrix via the blocked device kernels.

    The weighted kernel accumulates row-normalized weights in an f64
    lax.scan and performs ONE final f32 cast per result cell (transport
    compression; ops/distance.wjd_block_body) — absolute error provably
    below wjd_recheck_margin (~5e-7: ~s*2^-53 from the f64 normalize +
    reassociation, plus 2^-24 from the single cast). Any cell within that
    margin of a %.2f rounding boundary is recomputed through the bit-exact
    host path, so the CSV this feeds is provably identical to an all-host
    run (expected fixups: ~0.01% of cells at uniform value distribution)."""
    import numpy as np

    objs = [sketches[f].find_sketch(ksize, algo) for f in ordering]
    mins = np.stack([np.asarray(o.get_sketch(), dtype=np.uint64) for o in objs])
    if metric == "weightedjaccard":
        import jax

        from hulk_tpu.io.sketchio import _weights_of
        from hulk_tpu.ops.distance import pairwise_weighted_jaccard_dist

        weights = np.stack([_weights_of(o) for o in objs])
        ndev = len(jax.local_devices())
        if ndev > 1:
            # row blocks shard over the dp mesh; same per-cell math as the
            # single-device kernel (parallel/smash.py), so the boundary
            # recheck below stays sufficient
            from hulk_tpu.parallel.smash import sharded_pairwise_wjd

            d = sharded_pairwise_wjd(mins.astype(np.int64), weights)
        else:
            d = np.asarray(
                pairwise_weighted_jaccard_dist(mins.astype(np.int64), weights)
            )
        from hulk_tpu.ops.distance import wjd_recheck_margin

        cells = 100.0 - d * 100.0
        frac = np.abs(cells * 100.0 - np.floor(cells * 100.0) - 0.5)
        risky = np.argwhere(frac < wjd_recheck_margin(mins.shape[1]) * 10000.0)
        for i, j in risky:
            d[i, j] = sketches[ordering[i]].get_distance(
                sketches[ordering[j]], metric, ksize, algo
            )
        if len(risky):
            log.info("\trechecked %d boundary cells on the host", len(risky))
        return d
    from hulk_tpu.ops.distance import pairwise_jaccard_sim

    return 1.0 - np.asarray(pairwise_jaccard_sim(mins.astype(np.int64)))


# ---- print / distance (v0.0.2 surface reconstructions) ---------------------
# Neither exists in v1.0.0; the paper notebooks pipe `hulk print -f X` rows
# into feature-matrix CSVs (banner-matrix row format: sketch ints, then the
# file path as the label — paper/analysis-notebooks/2.indexing.ipynb), and
# `hulk distance` is listed in the v0.0.2 CLI (SURVEY.md).

def run_print(args) -> None:
    from hulk_tpu.io.sketchio import SketchIOError, load_hulk_data

    _setup_log(args.log_file or None)
    for f in args.file:
        try:
            data = load_hulk_data(f)
            obj = data.find_sketch(args.kmerSize, args.algorithm)
        except SketchIOError as e:
            _error_check(str(e))
            return
        row = ",".join(str(int(v)) for v in obj.get_sketch())
        sys.stdout.write(f"{row},{f}\n")


def run_distance(args) -> None:
    from hulk_tpu.io.sketchio import SketchIOError, load_hulk_data

    _setup_log(args.log_file or None)
    if len(args.file) != 2:
        _error_check("distance needs exactly two sketch files (-f A -f B)")
    try:
        a = load_hulk_data(args.file[0])
        b = load_hulk_data(args.file[1])
        d = a.get_distance(b, args.metric, args.kmerSize, args.algorithm)
    except SketchIOError as e:
        _error_check(str(e))
        return
    print(f"{d:.6f}")


# ---- index ----------------------------------------------------------------

def run_index(args) -> None:
    from hulk_tpu.index.lshforest import LSHForest, LSHIndexError
    from hulk_tpu.io.sketchio import SketchIOError, collect_jsons, load_hulk_data

    _setup_log(args.log_file or None)
    log.info("this is hulk (version %s)", HULK_COMPAT_VERSION)
    log.info("starting the index subcommand")
    if args.run not in ("create", "add", "search"):
        _error_check(f"unknown index operation: {args.run} (use create/add/search)")

    # backend-stall watchdog (search may engage device ranking; same
    # rationale as run_sketch — file inputs, so re-exec is transparent)
    import jax

    from hulk_tpu.stream.watchdog import guard_backend

    guard_backend(log, allow_reexec=jax.process_count() == 1)

    sketch_dir = args.sketchDir
    if not sketch_dir.endswith("/"):
        sketch_dir += "/"

    def load_mins():
        import os as _os

        out = []
        for jf in collect_jsons(sketch_dir, args.recursive):
            # the index itself may live in the sketch directory; it is never
            # a query/input sketch
            if _os.path.abspath(jf) == _os.path.abspath(args.indexName):
                continue
            data = load_hulk_data(jf)
            obj = data.find_sketch(args.kmerSize, "histosketch")
            out.append((jf, obj.get_sketch()))
        return out

    def check_size(got: int, what: str) -> None:
        if got != args.sketchSize:
            _error_check(
                f"sketch size mismatch: {what} has {got} values but the index "
                f"holds sketches of size {args.sketchSize} (pass -s {got})"
            )

    try:
        if args.run in ("create", "add"):
            entries = load_mins()
            if not entries:
                _error_check(
                    f"no sketches found in the supplied directory: {sketch_dir}"
                )
            check_size(len(entries[0][1]), entries[0][0])
            if args.run == "create":
                forest = LSHForest(
                    kmer_size=args.kmerSize,
                    sketch_size=args.sketchSize,
                    jaccard_thresh=args.jsThresh,
                )
            else:
                forest = LSHForest.load_json(args.indexName)
                check_size(forest.sketch_size, f"index {args.indexName}")
            import numpy as np

            forest.add_batch(
                [name for name, _ in entries],
                np.stack([m for _, m in entries]),
            )
            forest.write_json(args.indexName)
            log.info(
                "\tindexed %d sketches (bands=%d rows=%d) -> %s",
                len(forest.names), forest.n_bands, forest.band_rows, args.indexName,
            )
        else:  # search
            import jax
            import numpy as np

            forest = LSHForest.load_json(args.indexName)
            check_size(forest.sketch_size, f"index {args.indexName}")
            queries = load_mins()
            if not queries:
                _error_check(
                    f"no query sketches found in the supplied directory: {sketch_dir}"
                )
            for name, mins in queries:
                check_size(len(mins), name)
            ndev = len(jax.devices())
            if ndev > 1:
                # index rows sharded over the dp mesh: each device ranks its
                # own 1/D of the corpus, so indexes scale past one chip's
                # memory (parallel/lsh.py)
                from hulk_tpu.parallel.lsh import sharded_lsh_search
                from hulk_tpu.parallel.mesh import make_sketch_mesh

                mesh = make_sketch_mesh(n_dp=ndev, n_mp=1)
                qmat = np.stack([m for _, m in queries]).astype(np.uint64)
                all_hits = sharded_lsh_search(mesh, forest, qmat, args.jsThresh)
            else:
                all_hits = [
                    forest.search(mins, args.jsThresh) for _, mins in queries
                ]
            for (name, _), hits in zip(queries, all_hits):
                if not hits:
                    log.info("\tquery %s: no matches >= %.2f", name, args.jsThresh)
                for hit, sim in hits:
                    print(f"{name},{hit},{sim:.4f}")
            log.info(
                "\tsearched %d queries against %d entries%s",
                len(queries), len(forest.names),
                f" (index sharded over {ndev} devices)" if ndev > 1 else "",
            )
    except (LSHIndexError, SketchIOError) as e:
        _error_check(str(e))
        return
    log.info("finished")


def main(argv=None) -> int:
    _apply_platform_env()
    from hulk_tpu.parallel.distributed import init_distributed

    init_distributed()
    args = build_parser().parse_args(argv)
    if args.subcommand == "sketch":
        run_sketch(args)
    elif args.subcommand == "smash":
        run_smash(args)
    elif args.subcommand == "index":
        run_index(args)
    elif args.subcommand == "print":
        run_print(args)
    elif args.subcommand == "distance":
        run_distance(args)
    elif args.subcommand == "version":
        print(HULK_COMPAT_VERSION)
    else:
        build_parser().print_help()
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
