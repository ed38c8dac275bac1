"""One-process measurement grab for rounds where the tunnel is flaky:
probe the data path fast, exit 17 if wedged (caller retries in a fresh
process), else run the round-5 measurement set in THIS healthy process:

  1. step_variants — grouped stream step: compact on/off x R 8192/16384
     (VERDICT r4 item 3);
  2. drift flush decision numbers (VERDICT r4 item 4): device sequential
     drift scan (sharded_flush_step apply_drift=True) vs the host native
     drift flush, same realistic 1M-read histogram;
  3. no-drift device flush (the production candidate path) for scale.

Usage: python scripts/grab_measurements.py  (prints results; rc 17 = wedged)
"""
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax

    import hulk_tpu._jax_config  # noqa: F401
    from hulk_tpu.stream.watchdog import probe_device_roundtrip

    print(f"# backend={jax.default_backend()}", flush=True)
    if jax.default_backend() != "cpu":
        ok, dt = probe_device_roundtrip(45.0)
        if not ok:
            print("# data path wedged (45s probe)", flush=True)
            os._exit(17)  # abandoned native probe thread aborts teardown
        print(f"# data path alive ({dt:.2f}s)", flush=True)

    # ---- 1. step variants -------------------------------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from step_variants import measure

    for R in (8192, 16384):
        for compact in (False, True):
            t0 = time.time()
            rate = measure(R, compact, 12)
            print(
                f"stream R={R} compact={int(compact)}: {rate:,.0f} reads/s "
                f"(wall {time.time()-t0:.1f}s incl. compile)", flush=True,
            )

    # ---- 2+3. flush timings ----------------------------------------------
    import jax.numpy as jnp

    from hulk_tpu.hashes.cws import get_cws_tables
    from hulk_tpu.hashes.fdlibm import go_exp
    from hulk_tpu.parallel.mesh import (
        make_device_flush_candidates,
        make_sketch_mesh,
        shard_tables,
        sharded_flush_step,
    )
    from hulk_tpu.sketch.countmin import cms_row_bins_table, cms_shape
    from hulk_tpu.sketch.histosketch import HistoSketch

    K, W, S = 21, 9, 42
    NBINS = K ** 4
    depth, width = cms_shape()
    tables = get_cws_tables(S, NBINS)
    mesh = make_sketch_mesh(n_dp=1, n_mp=len(jax.local_devices()))
    c_sh, b_sh, er_sh = shard_tables(mesh, tables)
    row_bins = jax.device_put(
        cms_row_bins_table(NBINS, depth, width).astype(np.int32)
    )

    # a realistic 1M-read histogram: ~27M minimizers over 194481 bins
    rng = np.random.default_rng(0)
    hist_np = rng.poisson(139.0, NBINS).astype(np.int32)
    dhist = jax.device_put(hist_np)
    n_used = int((hist_np != 0).sum())
    print(f"# flush input: {n_used} used bins", flush=True)

    def time_it(fn, warm=1, reps=3):
        for _ in range(warm):
            out = fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    # host drift flush (native, bit-exact)
    hs = HistoSketch(K, S, NBINS, 0.9, tables=tables)
    ids = np.nonzero(hist_np)[0].astype(np.int64)
    freqs = hist_np.astype(np.float64)[ids]

    def host_drift():
        hs2 = HistoSketch(K, S, NBINS, 0.9, tables=tables)
        hs2.cms.sketch = hs.cms.sketch.copy()
        hs2.add_elements(ids, freqs)
        return hs2

    t_host, _ = time_it(host_drift, warm=1, reps=3)
    print(f"flush host drift (native, exact): {t_host:.3f}s", flush=True)

    def host_nodrift():
        hs2 = HistoSketch(K, S, NBINS, 1.0, tables=tables)
        hs2.add_elements(ids, freqs)
        return hs2

    t_hostn, _ = time_it(host_nodrift, warm=1, reps=3)
    print(f"flush host no-drift (native, exact): {t_hostn:.3f}s", flush=True)

    # device sequential drift scan
    dw = float(go_exp(-0.9))
    dflush = sharded_flush_step(mesh, dw, True, depth, width)

    def dev_drift():
        cms = jnp.zeros((depth, width), dtype=jnp.float64)
        sk = jnp.zeros(S, dtype=jnp.int64)
        wts = jnp.full(S, np.finfo(np.float64).max)
        cms, sk, wts = dflush(dhist, row_bins, cms, sk, wts, c_sh, b_sh, er_sh)
        return np.asarray(wts)

    t_dev, _ = time_it(dev_drift, warm=1, reps=2)
    print(f"flush device drift (sequential scan, XLA exp/log): {t_dev:.3f}s", flush=True)

    # no-drift production candidate device flush
    cflush = make_device_flush_candidates(mesh, depth, width)

    def dev_nodrift():
        cms = jnp.zeros((depth, width), dtype=jnp.float64)
        out = cflush(dhist, row_bins, cms, c_sh, b_sh, er_sh)
        return np.asarray(out[4])

    t_devn, _ = time_it(dev_nodrift, warm=1, reps=3)
    print(f"flush device no-drift (candidate path): {t_devn:.3f}s", flush=True)
    print("ALL_MEASUREMENTS_DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
