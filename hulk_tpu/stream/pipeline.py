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
from hulk_tpu.stream.fastq import LongRead
from hulk_tpu.sketch.histosketch import HistoSketch
from hulk_tpu.sketch.hyperminhash import HyperMinHash
from hulk_tpu.sketch.minhash import KHFSketch, KMVSketch
from hulk_tpu.sketch.spectrum import KmerSpectrum
from hulk_tpu.stream.fastq import batch_reads, batch_reads_native, prefetch_batches

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
    batch_size: int = 0  # 0 -> auto: largest fused-step-capable R (<= 16384)
    chunk_size: int = 0  # declared-but-unused in the reference (pipeline.go:21)
    device_stream: bool | None = None  # None -> auto (on when backend != cpu)
    data_parallel: bool | None = None  # None -> auto (shard when >1 device)
    device_flush: bool = False  # histosketch flush on device (no-drift only)
    input_paths: list | None = None  # set -> native C++ parser feeds batches
    checkpoint_path: str | None = None  # write a snapshot after each interval
    resume_from: str | None = None  # restore a snapshot and skip its reads
    # opt-in: interval snapshots (on_interval) also carry KMV/KHF/HMH
    # signatures — costs one device-state readback per interval on the
    # device stream (the user chose it; closes the documented
    # histosketch-only snapshot cliff)
    interval_secondary: bool = False

    def resolved_spectrum_size(self) -> int:
        return self.spectrum_size if self.spectrum_size else self.kmer_size ** 4

    def resolved_batch_size(self) -> int:
        """Auto batch size: the largest power-of-two R (<= 16384) whose read
        ids still pack above the value bits for the fused single-sort step
        (measured: R=16384 is ~20% faster than 8192 at k=21 — fixed
        per-dispatch costs amortise); large k takes 2048 (the fused path is
        unavailable at any R, and smaller batches bound the fallback's
        padded intermediates)."""
        if self.batch_size:
            return self.batch_size
        from hulk_tpu.ops.device_step import fused_bits_ok

        r = 16384
        while r > 2048 and not fused_bits_ok(self.kmer_size, r):
            r //= 2
        return r


@dataclass
class SketchResult:
    hulk_data: HULKData
    seq_count: int = 0
    length_total: int = 0
    minimizer_count: int = 0


class PipelineError(ValueError):
    pass


def _pad_raw(b, r: int, l: int):
    """Materialise a RawReads batch as the padded PackedReads equivalent
    (rare paths only: the large-k fallback)."""
    from hulk_tpu.ops.encode import PAD_CODE, PackedReads

    rows = b.lengths.shape[0]
    codes = np.full((r, l), PAD_CODE, dtype=np.uint8)
    lengths = np.zeros(r, dtype=np.int32)
    lengths[:rows] = b.lengths
    col = np.arange(l, dtype=np.int32)[None, :]
    codes[:rows] = np.where(
        col < b.lengths[:, None], b.codes[:, :l], np.uint8(PAD_CODE)
    )
    return PackedReads(
        codes=codes, lengths=lengths, file_idx=b.file_idx,
        reads_in_file_end=b.reads_in_file_end,
    )


class _DeviceStream:
    """Device-resident spectrum + secondary-sketch accumulation.

    Keeps the histogram (i32), KMV/KHF/HMH states on the accelerator; only
    interval boundaries pull the (small) histogram to the host for the exact
    flush. Bit-matches the host path (integer-exact ops throughout).

    Batches are staged host-side in groups of GROUP and shipped as ONE flat
    uint8 transfer (nibble-packed codes + u16 lengths), consumed by a single
    jitted lax.scan over the sub-batches. Remote-tunnel runtimes (axon)
    charge ~80 ms of fixed latency per transfer regardless of size and
    compress payloads to near-entropy on the wire, so transfer COUNT — not
    payload bytes — is the scarce resource; one buffer per group plus one
    dispatch per group amortises it 2*GROUP-fold. Tail groups are padded to
    GROUP with dead batches (all-pad codes, length 0 — inert in every
    kernel) so each (R, L) shape compiles exactly once.
    """

    # reads per transfer group: big enough that the tunnel's ~80 ms fixed
    # per-transfer cost amortises, small enough that several groups exist
    # per timed window for parse/transfer/dispatch pipelining
    GROUP_READS = 1 << 18

    @property
    def GROUP(self) -> int:
        # clamp: 32 was the measured sweet spot up to R=8192 (262k reads
        # per transfer); larger R keeps ~the same reads-per-group instead
        # of doubling it (pipelining granularity), tiny test batches stay
        # bounded
        return min(32, max(4, self.GROUP_READS // self._R))

    def __init__(self, cfg: SketchConfig, nbins: int):
        import jax.numpy as jnp

        from hulk_tpu.ops.device_step import pallas_supported

        self.cfg = cfg
        self.nbins = nbins
        self.pallas = pallas_supported()
        self.hist = jnp.zeros(nbins, dtype=jnp.int32)
        self.count = jnp.zeros((), dtype=jnp.int64)
        s = cfg.sketch_size
        sent = 0xFFFFFFFFFFFFFFFF
        # dummy [1] carries when a sketch is off: the grouped step carries
        # them through the scan untouched (donated either way)
        self.kmv_state = jnp.full(s if cfg.kmv else 1, sent, dtype=jnp.uint64)
        self.khf_state = jnp.full(s if cfg.khf else 1, sent, dtype=jnp.uint64)
        m = 1
        self.hmh_pqr = None
        if cfg.hmh:
            from hulk_tpu.sketch.hyperminhash import DEFAULT_P, DEFAULT_Q, DEFAULT_R

            self.hmh_pqr = (DEFAULT_P, DEFAULT_Q, DEFAULT_R)
            m = 1 << DEFAULT_P
        self.hmh_regs = jnp.zeros(m, dtype=jnp.uint64)
        self._staged: list = []  # host batches awaiting a grouped transfer
        self._staged_key = None  # (R, L) device shape of the staged batches
        # Group pack + host->device transfer + dispatch run on a dedicated
        # worker: the transfer blocks on the tunnel wire (~hundreds of ms per
        # group), and absorbing that wait here lets the producer keep parsing
        # instead of serialising parse -> transfer -> parse. One thread keeps
        # the donated-carry chain ordered; the queue is bounded (each pending
        # group pins ~64 MB of staged host batches).
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        self._exec = ThreadPoolExecutor(1, thread_name_prefix="hulk-dispatch")
        self._futs: "deque" = deque()
        self._max_pending = 3

    def feed(self, batch) -> None:
        """Stage one batch (padded PackedReads or parser-strided RawReads);
        dispatch happens per transfer group. Never synchronises with the
        device (the minimizer count accumulates in a donated device scalar,
        read once at the end — per-step readbacks cost a full tunnel round
        trip)."""
        key = (
            (self._R, batch.bucket)
            if hasattr(batch, "bucket")
            else batch.codes.shape
        )
        if self._staged and self._staged_key != key:
            self._flush_staged()
        self._staged_key = key
        self._staged.append(batch)
        if len(self._staged) >= self.GROUP:
            self._flush_staged()

    @property
    def _R(self) -> int:
        return self.cfg.resolved_batch_size()

    def _flush_staged(self) -> None:
        """Hand the staged group to the dispatch worker (bounded queue)."""
        if not self._staged:
            return
        staged, self._staged = self._staged, []
        while len(self._futs) >= self._max_pending:
            self._futs.popleft().result()
        self._futs.append(
            self._exec.submit(self._dispatch_group, staged, self._staged_key)
        )

    def _sync(self) -> None:
        """Flush staged batches and wait until the worker has dispatched
        everything (device execution itself stays async)."""
        self._flush_staged()
        while self._futs:
            self._futs.popleft().result()

    def _dispatch_group(self, staged, key) -> None:
        import jax

        from hulk_tpu import native
        from hulk_tpu.ops.device_step import (
            build_group_buffer,
            fused_bits_ok,
            pack_codes4,
            sketch_stream_group_step,
            stream_bucket,
        )

        cfg = self.cfg
        r, l = key
        is_raw = hasattr(staged[0], "bucket")
        if not fused_bits_ok(cfg.kmer_size, r):
            # large-k fallback: read ids don't pack above the value bits, so
            # the scan-fused group step (single-sort dedup) is unavailable
            if is_raw:
                staged = [_pad_raw(b, r, l) for b in staged]
            codes3 = jax.device_put(
                pack_codes4(np.stack([b.codes for b in staged]))
            )
            lengths2 = jax.device_put(np.stack([b.lengths for b in staged]))
            for i in range(len(staged)):
                self._step(codes3[i], lengths2[i], staged[i].codes.shape)
            return
        packed2 = False
        if is_raw:
            # fused native pad+pack straight from the strided parser output
            # (bit-identical device codes either way — tests/test_native.py).
            # v2 (2-bit + N bitmask) when the bucket allows: ~25% fewer raw
            # transfer bytes, measured ~40% faster through the tunnel wire.
            pairs = [(b.codes, b.lengths) for b in staged]
            if l % 8 == 0:
                flat = native.pack_group2(pairs, self.GROUP, r, l)
                packed2 = True
            else:
                flat = native.pack_group(pairs, self.GROUP, r, l)
        else:
            codes_list = [b.codes for b in staged]
            lengths_list = [b.lengths for b in staged]
            pad = self.GROUP - len(staged)
            if pad:
                dead_c = np.full((r, l), 5, dtype=np.uint8)
                dead_l = np.zeros(r, dtype=np.int32)
                codes_list += [dead_c] * pad
                lengths_list += [dead_l] * pad
            flat = build_group_buffer(codes_list, lengths_list)
        from hulk_tpu.ops.device_step import compact_default

        flatbuf = jax.device_put(flat)
        (
            self.hist, self.count, self.kmv_state, self.khf_state,
            self.hmh_regs,
        ) = sketch_stream_group_step(
            self.hist, self.count, self.kmv_state, self.khf_state,
            self.hmh_regs, flatbuf,
            g=self.GROUP, r=r, l=l, k=cfg.kmer_size, w=cfg.window_size,
            bucket=stream_bucket(r, r * (l + l % 2), l=l,
                                 k=cfg.kmer_size, w=cfg.window_size),
            pallas=self.pallas,
            use_kmv=cfg.kmv, use_khf=cfg.khf, use_hmh=cfg.hmh,
            hmh_pqr=self.hmh_pqr, packed2=packed2, compact=compact_default(),
        )

    def _step(self, codes, lengths, shape) -> None:
        from hulk_tpu.ops.device_sketches import hmh_update, khf_update, kmv_update
        from hulk_tpu.ops.device_step import (
            bottom_k_values,
            fused_bits_ok,
            sketch_stream_step,
            sketch_stream_step_fused,
            stream_bucket,
        )

        cfg = self.cfg
        r, l = shape
        l += l % 2  # pack_codes4 pads odd lengths
        # fused single-sort step when the read id packs above the value bits;
        # KMV's value-sorted prefix then comes from a bottom-k pass
        fused = fused_bits_ok(cfg.kmer_size, r)
        step = sketch_stream_step_fused if fused else sketch_stream_step
        self.hist, self.count, svals = step(
            self.hist,
            self.count,
            codes,
            lengths,
            k=cfg.kmer_size,
            w=cfg.window_size,
            bucket=stream_bucket(r, r * l, l=l, k=cfg.kmer_size,
                                 w=cfg.window_size),
            pallas=self.pallas,
            packed4=True,
        )
        if cfg.kmv:
            kmv_in = (
                bottom_k_values(svals, cfg.sketch_size) if fused else svals
            )
            self.kmv_state = kmv_update(self.kmv_state, kmv_in)
        if cfg.khf:
            self.khf_state = khf_update(self.khf_state, svals)
        if cfg.hmh:
            p_, q_, r_ = self.hmh_pqr
            self.hmh_regs = hmh_update(self.hmh_regs, svals, p=p_, q=q_, r=r_)

    def minimizer_total(self) -> int:
        self._sync()
        return int(self.count)

    def take_hist(self):
        """Hand the device-resident histogram to the caller and reset the
        carry — NO host transfer (the device flush consumes it in place)."""
        import jax.numpy as jnp

        self._sync()
        h = self.hist
        self.hist = jnp.zeros(self.nbins, dtype=jnp.int32)
        return h

    def drain_into(self, spectrum) -> None:
        import jax.numpy as jnp

        self._sync()
        h = np.asarray(self.hist).astype(np.float64)
        if h.any():
            spectrum.add_dense(h)
            self.hist = jnp.zeros(self.nbins, dtype=jnp.int32)

    def collect(self, kmv, khf, hmh) -> None:
        """MERGE device states into the host objects (merge, not overwrite,
        so resumed-from-checkpoint host state survives: bottom-k union /
        elementwise min / register max are the sketches' exact merges)."""
        self._sync()
        if kmv is not None and self.kmv_state is not None:
            vals = np.asarray(self.kmv_state)
            vals = vals[vals != np.uint64(0xFFFFFFFFFFFFFFFF)]
            merged = np.sort(np.concatenate([kmv._values, vals]))
            kmv._values = merged[: self.cfg.sketch_size]
        if khf is not None and self.khf_state is not None:
            khf.sketch = np.minimum(khf.sketch, np.asarray(self.khf_state))
        if hmh is not None and self.hmh_regs is not None:
            hmh.registers = np.maximum(hmh.registers, np.asarray(self.hmh_regs))


def _save_checkpoint(path, *, seq_count, length_total, minimizer_count, hs,
                     kmv, khf, hmh, cfg, origin=None):
    """Atomic snapshot of all persistent stream state at an interval
    boundary (the spectrum is empty there — flush just wiped it). The sketch
    JSON itself is the reference's only checkpoint (SURVEY.md §5); this is
    the beyond-reference device-state snapshot for long streams."""
    import os

    payload = dict(
        magic="hulk_checkpoint_v1",
        kmer_size=cfg.kmer_size, window_size=cfg.window_size,
        sketch_size=cfg.sketch_size, spectrum_size=cfg.resolved_spectrum_size(),
        decay_ratio=cfg.decay_ratio, interval=cfg.interval,
        seq_count=seq_count, length_total=length_total,
        minimizer_count=minimizer_count,
        hs_sketch=hs.sketch, hs_weights=hs.sketch_weights, cms=hs.cms.sketch,
    )
    if kmv is not None:
        payload["kmv_values"] = kmv._values
    if khf is not None:
        payload["khf_sketch"] = khf.sketch
    if hmh is not None:
        payload["hmh_registers"] = hmh.registers
    if origin is not None and origin[0] is not None:
        # input-stream seek target: (file index, reads consumed from it) at
        # this interval boundary — lets resume skip earlier files entirely
        # and line-skip the consumed prefix instead of replaying the stream
        payload["resume_file_idx"] = int(origin[0])
        payload["resume_reads_in_file"] = int(origin[1])
    tmp = f"{path}.tmp{os.getpid()}"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz", path)


def _load_checkpoint(path, cfg, hs, kmv, khf, hmh):
    """Restore a snapshot; returns (seq_count, length_total, minimizer_count).
    Raises PipelineError on any parameter mismatch."""
    import os

    if not os.path.exists(path):
        raise PipelineError(f"checkpoint does not exist: {path}")
    z = np.load(path, allow_pickle=False)
    if str(z["magic"]) != "hulk_checkpoint_v1":
        raise PipelineError(f"not a hulk checkpoint: {path}")
    for key, want in (
        ("kmer_size", cfg.kmer_size), ("window_size", cfg.window_size),
        ("sketch_size", cfg.sketch_size),
        ("spectrum_size", cfg.resolved_spectrum_size()),
        ("decay_ratio", cfg.decay_ratio), ("interval", cfg.interval),
    ):
        got = z[key].item()
        if got != want:
            raise PipelineError(
                f"checkpoint parameter mismatch: {key}={got} vs {want}"
            )
    hs.sketch = z["hs_sketch"].copy()
    hs.sketch_weights = z["hs_weights"].copy()
    hs.cms.sketch = z["cms"].copy()
    if kmv is not None:
        if "kmv_values" not in z:
            raise PipelineError("checkpoint has no KMV state")
        kmv._values = z["kmv_values"].copy()
    if khf is not None:
        if "khf_sketch" not in z:
            raise PipelineError("checkpoint has no KHF state")
        khf.sketch = z["khf_sketch"].copy()
    if hmh is not None:
        if "hmh_registers" not in z:
            raise PipelineError("checkpoint has no HyperMinHash state")
        hmh.registers = z["hmh_registers"].copy()
    origin = None
    if "resume_file_idx" in z:
        origin = (int(z["resume_file_idx"]), int(z["resume_reads_in_file"]))
    return (
        int(z["seq_count"]), int(z["length_total"]),
        int(z["minimizer_count"]), origin,
    )


class _ShardedDeviceStream:
    """Data-parallel device stream over a dp mesh: each device owns its own
    histogram/count/secondary-sketch carries (no per-step collectives); the
    merge is exact and happens on the host at interval boundaries (integer
    histogram sum, KMV bottom-k union, KHF elementwise min, HMH register
    max). N-device output is bit-identical to the 1-device output because
    binning is deterministic and all merges are order-free.
    """

    def __init__(self, cfg: SketchConfig, nbins: int, ndev: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hulk_tpu.ops.device_step import pallas_supported, stream_bucket
        from hulk_tpu.parallel.mesh import make_sketch_mesh, make_sharded_stream_step

        self.cfg = cfg
        self.nbins = nbins
        self.ndev = ndev
        self.mesh = make_sketch_mesh(
            n_dp=ndev, n_mp=1, devices=jax.local_devices()[:ndev]
        )
        self._shard2d = NamedSharding(self.mesh, P("dp", None))
        self._shard1d = NamedSharding(self.mesh, P("dp"))
        s = cfg.sketch_size
        self.hist = jax.device_put(
            jnp.zeros((ndev, nbins), dtype=jnp.int32), self._shard2d
        )
        self.count = jax.device_put(
            jnp.zeros(ndev, dtype=jnp.int64), self._shard1d
        )
        sent = 0xFFFFFFFFFFFFFFFF
        self.kmv_state = jax.device_put(
            jnp.full((ndev, s if cfg.kmv else 1), sent, dtype=jnp.uint64), self._shard2d
        )
        self.khf_state = jax.device_put(
            jnp.full((ndev, s if cfg.khf else 1), sent, dtype=jnp.uint64), self._shard2d
        )
        hmh_pqr = None
        m = 1
        if cfg.hmh:
            from hulk_tpu.sketch.hyperminhash import DEFAULT_P, DEFAULT_Q, DEFAULT_R

            hmh_pqr = (DEFAULT_P, DEFAULT_Q, DEFAULT_R)
            m = 1 << DEFAULT_P
        self.hmh_regs = jax.device_put(
            jnp.zeros((ndev, m), dtype=jnp.uint64), self._shard2d
        )
        self.pallas = pallas_supported()
        self._hmh_pqr = hmh_pqr
        self._steps: dict = {}
        self._legacy_steps: dict = {}
        self._staged: list = []
        self._staged_key = None
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        self._exec = ThreadPoolExecutor(1, thread_name_prefix="hulk-dispatch")
        self._futs: "deque" = deque()
        self._max_pending = 3
        self._mkstep = lambda r, l: make_sharded_stream_step(
            self.mesh,
            k=cfg.kmer_size,
            w=cfg.window_size,
            bucket=stream_bucket(
                r // ndev, (r // ndev) * (l + l % 2), l=l,
                k=cfg.kmer_size, w=cfg.window_size,
            ),
            pallas=self.pallas,
            use_kmv=cfg.kmv,
            use_khf=cfg.khf,
            use_hmh=cfg.hmh,
            hmh_pqr=hmh_pqr,
            packed4=True,
        )

    GROUP_READS = _DeviceStream.GROUP_READS

    @property
    def GROUP(self) -> int:
        return min(
            32, max(4, self.GROUP_READS // self.cfg.resolved_batch_size())
        )

    def feed(self, batch) -> None:
        """Stage one batch (padded PackedReads or parser-strided RawReads);
        transfers happen per GROUP like the single-device stream (same
        tunnel economics). Row->shard assignment: contiguous blocks of
        ceil(R/D) rows per shard, identical to P(\"dp\") row sharding of the
        padded stack, so per-shard carries are bit-identical to the
        per-batch path."""
        if hasattr(batch, "bucket"):
            key = (self.cfg.resolved_batch_size(), batch.bucket)
        else:
            key = batch.codes.shape
        if self._staged and self._staged_key != key:
            self._flush_staged()
        self._staged_key = key
        self._staged.append((batch.codes, batch.lengths))
        if len(self._staged) >= self.GROUP:
            self._flush_staged()

    def _flush_staged(self) -> None:
        if not self._staged:
            return
        staged, self._staged = self._staged, []
        while len(self._futs) >= self._max_pending:
            self._futs.popleft().result()
        self._futs.append(
            self._exec.submit(self._dispatch_group, staged, self._staged_key)
        )

    def _sync(self) -> None:
        self._flush_staged()
        while self._futs:
            self._futs.popleft().result()

    def _dispatch_group(self, staged, key) -> None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hulk_tpu import native
        from hulk_tpu.ops.device_step import fused_bits_ok, stream_bucket
        from hulk_tpu.parallel.mesh import make_sharded_group_step

        cfg = self.cfg
        R, l = key
        ndev = self.ndev
        rs = (R + ndev - 1) // ndev
        if not native.available() or not fused_bits_ok(cfg.kmer_size, rs):
            self._dispatch_legacy(staged, key)
            return
        packed2 = l % 8 == 0
        pack = native.pack_group2 if packed2 else native.pack_group
        shard_bufs = []
        for d in range(ndev):
            pairs = []
            for codes, lengths in staged:
                rows = lengths.shape[0]
                lo = min(d * rs, rows)
                hi = min(lo + rs, rows)
                pairs.append((codes[lo:hi], lengths[lo:hi]))
            shard_bufs.append(pack(pairs, self.GROUP, rs, l))
        devs = list(self.mesh.devices[:, 0])
        flat = jax.make_array_from_single_device_arrays(
            (ndev, shard_bufs[0].shape[0]),
            NamedSharding(self.mesh, P("dp", None)),
            [jax.device_put(b[None], d) for b, d in zip(shard_bufs, devs)],
        )
        from hulk_tpu.ops.device_step import compact_default

        step = self._steps.get((rs, l, packed2))
        if step is None:
            step = self._steps[(rs, l, packed2)] = make_sharded_group_step(
                self.mesh, g=self.GROUP, r=rs, l=l, k=cfg.kmer_size,
                w=cfg.window_size,
                bucket=stream_bucket(rs, rs * (l + l % 2), l=l,
                                     k=cfg.kmer_size, w=cfg.window_size),
                pallas=self.pallas, use_kmv=cfg.kmv, use_khf=cfg.khf,
                use_hmh=cfg.hmh, hmh_pqr=self._hmh_pqr, packed2=packed2,
                compact=compact_default(),
            )
        (
            self.hist, self.count, self.kmv_state, self.khf_state,
            self.hmh_regs,
        ) = step(
            self.hist, self.count, self.kmv_state, self.khf_state,
            self.hmh_regs, flat,
        )

    def _dispatch_legacy(self, staged, key) -> None:
        """Per-batch sharded dispatch (large-k fallback / no native lib):
        padded [R, L] batches, rows padded to a dp multiple, nibble codes."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hulk_tpu.ops.device_step import pack_codes4

        R, l = key
        pad_to = R + ((-R) % self.ndev)
        norm = []
        for codes, lengths in staged:
            rows = lengths.shape[0]
            if codes.shape != (pad_to, l) or rows != pad_to:
                full = np.full((pad_to, l), 5, dtype=np.uint8)
                ln = np.zeros(pad_to, dtype=np.int32)
                ln[:rows] = lengths
                col = np.arange(l, dtype=np.int32)[None, :]
                full[:rows] = np.where(
                    col < lengths[:, None], codes[:, :l], np.uint8(5)
                )
                codes, lengths = full, ln
            norm.append((codes, lengths))
        step = self._legacy_steps.get((pad_to, l))
        if step is None:
            step = self._legacy_steps[(pad_to, l)] = self._mkstep(pad_to, l)
        codes3 = jax.device_put(
            pack_codes4(np.stack([c for c, _ in norm])),
            NamedSharding(self.mesh, P(None, "dp", None)),
        )
        lengths2 = jax.device_put(
            np.stack([ln for _, ln in norm]),
            NamedSharding(self.mesh, P(None, "dp")),
        )
        for i in range(len(norm)):
            (
                self.hist, self.count, self.kmv_state, self.khf_state,
                self.hmh_regs,
            ) = step(
                self.hist, self.count, codes3[i], lengths2[i],
                self.kmv_state, self.khf_state, self.hmh_regs,
            )

    def minimizer_total(self) -> int:
        self._sync()
        return int(np.asarray(self.count).sum())

    def take_hist(self):
        """Sum the per-shard histograms ON DEVICE and reset the carries;
        returns a [nbins] device array for the device flush."""
        import jax
        import jax.numpy as jnp

        self._sync()
        h = _sum_shards(self.hist)
        self.hist = jax.device_put(
            jnp.zeros((self.ndev, self.nbins), dtype=jnp.int32), self._shard2d
        )
        return h

    def drain_into(self, spectrum) -> None:
        import jax
        import jax.numpy as jnp

        self._sync()
        h = np.asarray(self.hist).astype(np.int64).sum(axis=0).astype(np.float64)
        if h.any():
            spectrum.add_dense(h)
            self.hist = jax.device_put(
                jnp.zeros((self.ndev, self.nbins), dtype=jnp.int32), self._shard2d
            )

    def collect(self, kmv, khf, hmh) -> None:
        """Merge per-shard device states into the host objects (exact:
        bottom-k union / elementwise min / register max — also preserves
        resumed-from-checkpoint host state)."""
        self._sync()
        sent = np.uint64(0xFFFFFFFFFFFFFFFF)
        if kmv is not None:
            vals = np.sort(
                np.concatenate(
                    [kmv._values, np.asarray(self.kmv_state).reshape(-1)]
                )
            )
            vals = vals[vals != sent]
            kmv._values = vals[: self.cfg.sketch_size]
        if khf is not None:
            khf.sketch = np.minimum(khf.sketch, np.asarray(self.khf_state).min(axis=0))
        if hmh is not None:
            hmh.registers = np.maximum(
                hmh.registers, np.asarray(self.hmh_regs).max(axis=0)
            )


_hist_add_jit = None


def _merge_host_hist(hist, spectrum):
    """Add the host spectrum's counts (long-read contributions) onto a
    device-resident histogram and wipe the host side — the device-flush
    path's merge point (exact: integer counts).

    The device_put source MUST be an owned copy: on the CPU backend
    device_put can alias the numpy buffer zero-copy, and wiping
    spectrum.bins before the (async) add executes would silently zero the
    transferred counts (observed as a whole-sketch mismatch whose
    occurrence depended on allocator state). astype always copies."""
    global _hist_add_jit
    import jax

    if _hist_add_jit is None:
        _hist_add_jit = jax.jit(lambda a, b: a + b, donate_argnums=(0,))
    host = spectrum.bins.astype(np.int32)  # owned copy, kept alive by jax
    out = _hist_add_jit(hist, jax.device_put(host))
    spectrum.wipe()
    return out


_sum_shards_jit = None


def _sum_shards(hist):
    global _sum_shards_jit
    if _sum_shards_jit is None:
        import jax
        import jax.numpy as jnp

        _sum_shards_jit = jax.jit(lambda x: x.astype(jnp.int64).sum(axis=0))
    return _sum_shards_jit(hist)


class _DeviceFlusher:
    """PRODUCTION device histosketch flush (no-drift): the CMS update and
    frequency estimates run exactly on device, the CWS argmin runs on device
    with XLA exp/log, and the top-T candidates per slot are re-derived on
    the host with the bit-exact Go ports (HistoSketch.apply_flush_candidates)
    — bit-identical output, proven by the margin-count bound with a full
    host-flush fallback if it ever trips (parallel/mesh.FLUSH_MARGIN_REL).

    State: the CMS carry lives on device; the CWS tables upload once,
    sharded over the mp axis (all local devices). hs.sketch/hs.weights stay
    host-side (tiny) and update after every flush; hs.cms.sketch is synced
    from the device on demand (checkpoints, end of stream)."""

    def __init__(self, hs, nbins: int):
        import jax
        import jax.numpy as jnp

        from hulk_tpu.parallel.mesh import (
            FLUSH_TOP_T,
            make_device_flush_candidates,
            make_sketch_mesh,
            shard_tables,
        )
        from hulk_tpu.sketch.countmin import cms_row_bins_table
        from hulk_tpu.sketch.spectrum import MIN_USED_BINS, SpectrumError

        self.hs = hs
        self.nbins = nbins
        self._min_used = MIN_USED_BINS
        self._spectrum_error = SpectrumError
        ndev = len(jax.local_devices())
        self.mesh = make_sketch_mesh(
            n_dp=1, n_mp=ndev, devices=jax.local_devices()
        )
        self.top_t = FLUSH_TOP_T
        depth, width = hs.cms.sketch.shape
        self.fn = make_device_flush_candidates(self.mesh, depth, width)
        self.row_bins = jax.device_put(
            cms_row_bins_table(nbins, depth, width).astype(np.int32)
        )
        self.tables = shard_tables(self.mesh, hs.cws)
        # carry initialised from the host CMS (nonzero after checkpoint
        # resume). astype(copy=True-by-default) yields an OWNED buffer:
        # device_put on the CPU backend can alias numpy memory, and the
        # host fallback flush mutates hs.cms.sketch in place (see
        # _merge_host_hist's aliasing note).
        self.cms = jax.device_put(hs.cms.sketch.astype(np.float64))

    def flush_from(self, hist) -> None:
        """Consume a device-resident [nbins] histogram (reference flush
        semantics: no-op when untouched, fatal below MIN_USED_BINS)."""
        used = int((hist != 0).sum())  # one scalar readback per interval
        if used == 0:
            return
        if used / float(self.nbins) < self._min_used:
            raise self._spectrum_error("not used yet")
        cms_prev = self.cms
        cms_out, cb, ce, cl, mc = self.fn(hist, self.row_bins, self.cms, *self.tables)
        if self.hs.apply_flush_candidates(
            np.asarray(cb), np.asarray(ce), np.asarray(cl), np.asarray(mc),
            self.top_t,
        ):
            self.cms = cms_out
            return
        # margin overflow (see FLUSH_MARGIN_REL: never expected, but handled
        # so exactness is unconditional): full exact host flush instead
        import jax

        log.info("\tdevice flush margin overflow; host fallback")
        self.hs.cms.sketch = np.asarray(cms_prev)
        h = np.asarray(hist).astype(np.float64)
        ids = np.nonzero(h)[0].astype(np.int64)
        self.hs.add_elements(ids, h[ids])
        # astype returns an owned copy (aliasing note above):
        # hs.cms.sketch mutates in place on the next fallback flush
        self.cms = jax.device_put(
            self.hs.cms.sketch.astype(np.float64, copy=True)
        )

    def sync_cms(self) -> None:
        """Pull the device CMS carry into hs (checkpoints / end of run)."""
        self.hs.cms.sketch = np.asarray(self.cms).astype(np.float64)


def run_sketch_pipeline(
    reads: Iterator[bytes], cfg: SketchConfig, on_interval=None
) -> SketchResult:
    """on_interval: optional callable invoked with a HULKData snapshot of the
    current histosketch after every interval flush — the documented (but
    never implemented) reference `--stream` behaviour (cmd/sketch.go:56).
    Interval snapshots carry the histosketch signature only, unless
    cfg.interval_secondary opts into KMV/KHF/HMH signatures too (one
    device-state readback per interval on the device stream)."""
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
    resume_base = 0
    resume_origin = None
    if cfg.resume_from:
        if not cfg.interval:
            raise PipelineError("resume requires interval mode (snapshots are taken at interval flushes)")
        seq_count, length_total, minimizer_count, resume_origin = _load_checkpoint(
            cfg.resume_from, cfg, hs, kmv, khf, hmh
        )
        resume_base = seq_count
        log.info("\tresumed from checkpoint at %d sequences", seq_count)
    next_report = (seq_count // 100_000 + 1) * 100_000

    def flush():
        # boss.go:112-128: flush is a no-op on an untouched spectrum;
        # otherwise dump (ascending bins) -> histosketch, then wipe
        if spectrum.cardinality() != 0:
            bins, freqs = spectrum.dump()
            hs.add_elements(bins, freqs)
            spectrum.wipe()

    def interval_flush(counters=None, snap_states=None, origin=None):
        flush()
        if on_interval is not None:
            snap = HULKData(filename=cfg.file_name, banner=cfg.banner_label)
            snap.add(hs)
            if cfg.interval_secondary and snap_states is not None:
                for obj in snap_states:
                    if obj is not None:
                        snap.add(obj)
            on_interval(snap)
        if cfg.checkpoint_path and counters is not None:
            sc, lt, mc = counters
            skmv, skhf, shmh = (
                snap_states if snap_states is not None else (kmv, khf, hmh)
            )
            _save_checkpoint(
                cfg.checkpoint_path, seq_count=sc, length_total=lt,
                minimizer_count=mc, hs=hs, kmv=skmv, khf=skhf, hmh=shmh,
                cfg=cfg, origin=origin,
            )

    import jax

    use_device = cfg.device_stream
    if use_device is None:
        use_device = jax.default_backend() != "cpu"
    ndev = len(jax.local_devices())
    use_dp = cfg.data_parallel
    if use_dp is None:
        use_dp = ndev > 1
    multi_host = jax.process_count() > 1
    if multi_host and cfg.interval:
        raise PipelineError(
            "interval flushing requires a single process (multi-host runs "
            "shard whole files; use interval=0)"
        )
    if multi_host and (cfg.checkpoint_path or cfg.resume_from):
        raise PipelineError(
            "checkpoint/resume requires a single process (snapshots are "
            "per-interval, and intervals are single-process)"
        )
    if use_device and use_dp and ndev > 1:
        dev = _ShardedDeviceStream(cfg, nbins, ndev)
    elif use_device:
        dev = _DeviceStream(cfg, nbins)
    else:
        dev = None

    flusher = None
    if cfg.device_flush:
        if cfg.decay_ratio != 1.0:
            raise PipelineError(
                "device flush supports decayRatio=1.0 only (the drift "
                "selection is order-dependent and a device scan measures "
                "~5x slower than the overlapped host flush — decision "
                "record in docs/PERF.md; the host flush handles drift "
                "exactly at zero wall-time cost)"
            )
        if dev is None:
            raise PipelineError("device flush requires the device stream")
        if multi_host:
            raise PipelineError(
                "device flush requires a single process (the reference "
                "merges spectra before flushing once)"
            )
        flusher = _DeviceFlusher(hs, nbins)

    cut = cfg.interval if cfg.interval else None
    seek_resume = (
        resume_base > 0
        and resume_origin is not None
        and reads is None
        and not cfg.fasta
    )
    if reads is None:
        from hulk_tpu import native

        if cfg.input_paths is None or not native.available():
            raise PipelineError("native input path requested but unavailable")
        kw = {}
        if seek_resume:
            # O(parse-free) resume: earlier files never open; the consumed
            # prefix of the boundary file is skipped by newline counting
            kw = dict(
                start_file=resume_origin[0], skip_reads=resume_origin[1]
            )
            log.info(
                "\tseek resume: file %d, skipping %d records",
                resume_origin[0], resume_origin[1],
            )
        batches = batch_reads_native(
            cfg.input_paths, batch_size=cfg.resolved_batch_size(),
            cut_every=cut,
            fasta=cfg.fasta,
            raw=isinstance(dev, (_DeviceStream, _ShardedDeviceStream)), **kw,
        )
    else:
        batches = batch_reads(
            reads, batch_size=cfg.resolved_batch_size(), cut_every=cut
        )

    if resume_base and not seek_resume:
        def _skip_resumed(src, skip):
            done = 0
            for b in src:
                if done < skip:
                    done += (
                        1 if isinstance(b, LongRead)
                        else int((b.lengths > 0).sum())
                    )
                    if done > skip:
                        raise PipelineError(
                            "resume point does not align with batch cuts"
                        )
                    continue
                yield b

        batches = _skip_resumed(batches, resume_base)

    if dev is not None:
        # queue depth covers a full transfer group plus the next one being
        # produced, so group staging never starves the device dispatch
        batches = prefetch_batches(batches, depth=2 * dev.GROUP)

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

    last_origin = None
    try:
        for batch in batches:
            if batch.file_idx is not None:
                last_origin = (batch.file_idx, batch.reads_in_file_end)
            if isinstance(batch, LongRead):
                # a read past the batched path's length cap: blockwise scan
                # (ops/longread.py — bit-identical to an in-context scan),
                # host-side state updates. Secondary sketches merge with the
                # device states exactly (collect() unions/mins/maxes); the
                # histogram contribution rides the host `spectrum` and is
                # merged at flush (drain_into adds device counts to it; the
                # device-flush path adds it onto the device histogram).
                # The background interval-flush worker owns `spectrum` while
                # a flush is pending (dump+wipe, flush() below) — wait it
                # out before touching the spectrum from this thread.
                from hulk_tpu.ops.longread import long_read_minimizers

                wait_flush()
                L = int(batch.codes.shape[0])
                if L < w + k - 1:
                    raise PipelineError("sequence length must be >= w + k - 1")
                flat = long_read_minimizers(batch.codes, k=k, w=w)
                minimizer_count += int(flat.shape[0])
                if flat.shape[0]:
                    spectrum.add_hashes(flat)
                    if kmv is not None:
                        kmv.add_hashes(flat)
                    if khf is not None:
                        khf.add_hashes(flat)
                    if hmh is not None:
                        hmh.add_hashes(flat)
                n_in_batch = 1
                seq_count += 1
                length_total += L
            else:
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
                    hist_handle = None
                    if flusher is not None:
                        # hist handed off device-side; the host exact-select
                        # runs in the worker thread, overlapped with the next
                        # interval's streaming
                        hist_handle = dev.take_hist()
                        if spectrum.cardinality() != 0:
                            # long-read contributions accumulated host-side
                            hist_handle = _merge_host_hist(hist_handle, spectrum)
                    else:
                        dev.drain_into(spectrum)
                    counters = snap_states = None
                    want_snap = cfg.checkpoint_path or (
                        cfg.interval_secondary and on_interval is not None
                    )
                    if want_snap:
                        import copy

                        snap_states = (
                            copy.deepcopy(kmv), copy.deepcopy(khf),
                            copy.deepcopy(hmh),
                        )
                        # one device-state readback per interval — the
                        # opt-in cost of secondary-sketch snapshots
                        dev.collect(*snap_states)
                    if cfg.checkpoint_path:
                        counters = (
                            seq_count, length_total,
                            minimizer_count + dev.minimizer_total(),
                        )

                    def _interval_work(h=hist_handle, c=counters,
                                       s=snap_states, o=last_origin):
                        if flusher is not None:
                            flusher.flush_from(h)
                            if cfg.checkpoint_path:
                                flusher.sync_cms()
                        interval_flush(c, s, o)

                    pending = pool.submit(_interval_work)
                else:
                    snap_states = None
                    if cfg.interval_secondary and on_interval is not None:
                        import copy

                        snap_states = (
                            copy.deepcopy(kmv), copy.deepcopy(khf),
                            copy.deepcopy(hmh),
                        )
                    interval_flush(
                        (seq_count, length_total, minimizer_count),
                        snap_states, last_origin,
                    )

        log.info("generating final histosketch of k-mer spectra...")
        wait_flush()
        if dev is not None:
            if flusher is not None:
                h = dev.take_hist()
                if spectrum.cardinality() != 0:
                    h = _merge_host_hist(h, spectrum)
                flusher.flush_from(h)
                flusher.sync_cms()
            else:
                dev.drain_into(spectrum)
            dev.collect(kmv, khf, hmh)
            minimizer_count = minimizer_count + dev.minimizer_total()

        if multi_host:
            # merge the per-process partial states (exact: integer histogram
            # sum, bottom-k union, elementwise min / register max), then run
            # the identical flush everywhere — every process ends up with the
            # same HULKData and the caller writes from process 0 only.
            from hulk_tpu.parallel import distributed as dist

            log.info("\tmerging %d process shards...", jax.process_count())
            spectrum.bins = dist.allreduce_sum(spectrum.bins)
            seq_count = int(dist.allreduce_sum(np.array([seq_count]))[0])
            length_total = int(dist.allreduce_sum(np.array([length_total]))[0])
            minimizer_count = int(
                dist.allreduce_sum(np.array([minimizer_count]))[0]
            )
            if kmv is not None:
                sent = np.uint64(0xFFFFFFFFFFFFFFFF)
                padded = np.full(cfg.sketch_size, sent, dtype=np.uint64)
                padded[: kmv._values.shape[0]] = kmv._values
                vals = np.sort(dist.allgather(padded).reshape(-1))
                vals = vals[vals != sent]
                kmv._values = vals[: cfg.sketch_size]
            if khf is not None:
                khf.sketch = dist.allgather(khf.sketch).min(axis=0)
            if hmh is not None:
                hmh.registers = dist.allgather(hmh.registers).max(axis=0)
        flush()
    finally:
        pool.shutdown(wait=False)
        if dev is not None and hasattr(dev, "_exec"):
            dev._exec.shutdown(wait=False)

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
