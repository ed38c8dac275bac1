"""The sketch pipeline: reads -> minimizers -> spectrum -> histosketch.

Replaces the reference's 4-process goroutine pipeline + boss/minion worker
pool (src/pipeline/, SURVEY.md §2.3) with batched device computation: the
minimizer scan runs as one jitted kernel over a [reads, positions] batch
(parallelism from VPU lanes, not workers), binning/histogramming is
vectorised, and the flush (spectrum -> histosketch) is the exact host scan.

Determinism: the reference is only deterministic for p=1 (flush/in-flight
race, boss.go:114); here interval boundaries are defined by global read index
(batches are cut at interval multiples), so output is deterministic for any
batching and equals the reference's p=1 behaviour.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Iterator

import numpy as np


from hulk_tpu.io.sketchio import HULKData
from hulk_tpu.ops.minimizer import minimizer_scan, short_read_mask
from hulk_tpu.sketch.histosketch import HistoSketch
from hulk_tpu.sketch.hyperminhash import HyperMinHash
from hulk_tpu.sketch.minhash import KHFSketch, KMVSketch
from hulk_tpu.sketch.spectrum import KmerSpectrum
from hulk_tpu.stream.fastq import batch_reads, batch_reads_native

log = logging.getLogger("hulk")


@dataclass
class SketchConfig:
    kmer_size: int = 21
    window_size: int = 9
    sketch_size: int = 50
    spectrum_size: int = 0  # 0 -> k^4 (cmd/sketch.go:118)
    decay_ratio: float = 1.0
    interval: int = 0
    fasta: bool = False
    kmv: bool = False
    khf: bool = False
    hmh: bool = False  # HyperMinHash (beyond-reference extension)
    banner_label: str = "blank"
    file_name: str = ""
    batch_size: int = 2048
    chunk_size: int = 0  # declared-but-unused in the reference (pipeline.go:21)
    device_stream: bool | None = None  # None -> auto (on when backend != cpu)
    input_paths: list | None = None  # set -> native C++ parser feeds batches

    def resolved_spectrum_size(self) -> int:
        return self.spectrum_size if self.spectrum_size else self.kmer_size ** 4


@dataclass
class SketchResult:
    hulk_data: HULKData
    seq_count: int = 0
    length_total: int = 0
    minimizer_count: int = 0


class PipelineError(ValueError):
    pass


class _DeviceStream:
    """Device-resident spectrum + secondary-sketch accumulation.

    Keeps the histogram (i32), KMV/KHF/HMH states on the accelerator; only
    interval boundaries pull the (small) histogram to the host for the exact
    flush. Bit-matches the host path (integer-exact ops throughout).
    """

    def __init__(self, cfg: SketchConfig, nbins: int):
        import jax.numpy as jnp

        from hulk_tpu.ops.device_step import pallas_supported

        self.cfg = cfg
        self.nbins = nbins
        self.pallas = pallas_supported()
        self.hist = jnp.zeros(nbins, dtype=jnp.int32)
        self.count = jnp.zeros((), dtype=jnp.int64)
        s = cfg.sketch_size
        self.kmv_state = jnp.full(s, 0xFFFFFFFFFFFFFFFF, dtype=jnp.uint64) if cfg.kmv else None
        self.khf_state = jnp.full(s, 0xFFFFFFFFFFFFFFFF, dtype=jnp.uint64) if cfg.khf else None
        self.hmh_regs = None
        if cfg.hmh:
            from hulk_tpu.sketch.hyperminhash import DEFAULT_P

            self.hmh_regs = jnp.zeros(1 << DEFAULT_P, dtype=jnp.uint64)

    def feed(self, batch) -> None:
        """Dispatch one batch; never synchronises with the device (the
        minimizer count accumulates in a donated device scalar, read once at
        the end — per-step readbacks cost a full tunnel round trip)."""
        import jax

        from hulk_tpu.ops.device_sketches import hmh_update, khf_update, kmv_update
        from hulk_tpu.ops.device_step import sketch_stream_step, stream_bucket

        cfg = self.cfg
        codes = jax.device_put(batch.codes)
        lengths = jax.device_put(batch.lengths)
        r, l = batch.codes.shape
        self.hist, self.count, svals = sketch_stream_step(
            self.hist,
            self.count,
            codes,
            lengths,
            k=cfg.kmer_size,
            w=cfg.window_size,
            bucket=stream_bucket(r, r * l),
            pallas=self.pallas,
        )
        if self.kmv_state is not None:
            self.kmv_state = kmv_update(self.kmv_state, svals)
        if self.khf_state is not None:
            self.khf_state = khf_update(self.khf_state, svals)
        if self.hmh_regs is not None:
            from hulk_tpu.sketch.hyperminhash import DEFAULT_P, DEFAULT_Q, DEFAULT_R

            self.hmh_regs = hmh_update(
                self.hmh_regs, svals, p=DEFAULT_P, q=DEFAULT_Q, r=DEFAULT_R
            )

    def minimizer_total(self) -> int:
        return int(self.count)

    def drain_into(self, spectrum) -> None:
        import jax.numpy as jnp

        h = np.asarray(self.hist).astype(np.float64)
        if h.any():
            spectrum.add_dense(h)
            self.hist = jnp.zeros(self.nbins, dtype=jnp.int32)

    def collect(self, kmv, khf, hmh) -> None:
        if kmv is not None and self.kmv_state is not None:
            vals = np.asarray(self.kmv_state)
            kmv._values = vals[vals != np.uint64(0xFFFFFFFFFFFFFFFF)]
        if khf is not None and self.khf_state is not None:
            khf.sketch = np.asarray(self.khf_state).copy()
        if hmh is not None and self.hmh_regs is not None:
            hmh.registers = np.asarray(self.hmh_regs).copy()


def run_sketch_pipeline(
    reads: Iterator[bytes], cfg: SketchConfig, on_interval=None
) -> SketchResult:
    """on_interval: optional callable invoked with a HULKData snapshot of the
    current histosketch after every interval flush — the documented (but
    never implemented) reference `--stream` behaviour (cmd/sketch.go:56).
    Interval snapshots carry the histosketch signature only; secondary
    sketches would cost a device sync per interval."""
    k, w = cfg.kmer_size, cfg.window_size
    if not 0 < k < 32:
        raise PipelineError("k size must be: 0 < k < 32")
    if not 0 < w < 257:
        raise PipelineError("w must be: 0 < w < 257")
    nbins = cfg.resolved_spectrum_size()

    spectrum = KmerSpectrum(nbins)
    hs = HistoSketch(k, cfg.sketch_size, nbins, cfg.decay_ratio)
    kmv = KMVSketch(k, cfg.sketch_size) if cfg.kmv else None
    khf = KHFSketch(k, cfg.sketch_size) if cfg.khf else None
    hmh = HyperMinHash(k) if cfg.hmh else None

    seq_count = 0
    length_total = 0
    minimizer_count = 0
    next_report = 100_000

    def flush():
        # boss.go:112-128: flush is a no-op on an untouched spectrum;
        # otherwise dump (ascending bins) -> histosketch, then wipe
        if spectrum.cardinality() != 0:
            bins, freqs = spectrum.dump()
            hs.add_elements(bins, freqs)
            spectrum.wipe()

    def interval_flush():
        flush()
        if on_interval is not None:
            snap = HULKData(filename=cfg.file_name, banner=cfg.banner_label)
            snap.add(hs)
            on_interval(snap)

    import jax

    use_device = cfg.device_stream
    if use_device is None:
        use_device = jax.default_backend() != "cpu"
    dev = _DeviceStream(cfg, nbins) if use_device else None

    cut = cfg.interval if cfg.interval else None
    if reads is None:
        from hulk_tpu import native

        if cfg.input_paths is None or not native.available():
            raise PipelineError("native input path requested but unavailable")
        batches = batch_reads_native(
            cfg.input_paths, batch_size=cfg.batch_size, cut_every=cut,
            fasta=cfg.fasta,
        )
    else:
        batches = batch_reads(reads, batch_size=cfg.batch_size, cut_every=cut)

    # Interval flushes on the device path run in a single background worker:
    # the host CWS/CMS scan (native, exact) overlaps the next interval's
    # device streaming. Only one flush is ever in flight (the histosketch is
    # sequential across intervals), enforced by waiting before each drain.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(1)
    pending = None

    def wait_flush():
        nonlocal pending
        if pending is not None:
            pending.result()
            pending = None

    try:
        for batch in batches:
            active = batch.lengths > 0
            bad = short_read_mask(batch.lengths, k, w) & active
            if bad.any():
                raise PipelineError("sequence length must be >= w + k - 1")
            if dev is not None:
                dev.feed(batch)
            else:
                vals, mask = minimizer_scan(batch.codes, batch.lengths, k=k, w=w)
                vals = np.asarray(vals)
                mask = np.asarray(mask)
                flat = vals[mask]
                minimizer_count += int(flat.shape[0])
                if flat.shape[0]:
                    spectrum.add_hashes(flat)
                    if kmv is not None:
                        kmv.add_hashes(flat)
                    if khf is not None:
                        khf.add_hashes(flat)
                    if hmh is not None:
                        hmh.add_hashes(flat)
            n_in_batch = int(active.sum())
            seq_count += n_in_batch
            length_total += int(batch.lengths.sum())
            while seq_count >= next_report:
                log.info("\tprocessed %d sequences", next_report)
                next_report += 100_000
            if cut is not None and seq_count % cut == 0 and n_in_batch > 0:
                log.info("\treached interval %d -> histosketching", seq_count // cut)
                if dev is not None:
                    wait_flush()
                    dev.drain_into(spectrum)
                    pending = pool.submit(interval_flush)
                else:
                    interval_flush()

        log.info("generating final histosketch of k-mer spectra...")
        wait_flush()
        if dev is not None:
            dev.drain_into(spectrum)
            dev.collect(kmv, khf, hmh)
            minimizer_count = dev.minimizer_total()
        flush()
    finally:
        pool.shutdown(wait=False)

    if seq_count == 0:
        raise PipelineError("no sequences received")

    hulk_data = HULKData(filename=cfg.file_name, banner=cfg.banner_label)
    hulk_data.add(hs)
    if kmv is not None:
        hulk_data.add(kmv)
    if khf is not None:
        hulk_data.add(khf)
    if hmh is not None:
        hulk_data.add(hmh)
    return SketchResult(
        hulk_data=hulk_data,
        seq_count=seq_count,
        length_total=length_total,
        minimizer_count=minimizer_count,
    )
