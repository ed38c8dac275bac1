"""One-command scaling harness: the BASELINE scaling table in one run.

Detects the visible devices, then at every power-of-two mesh width D up to
the device count measures:

  * dp-sharded streaming sketch rate (reads/s and reads/s/chip) — the
    production sharded step (per-device donated carries, zero per-step
    collectives, parallel/mesh.make_sharded_stream_step) over pre-staged
    shards, chained dispatch with one readback at the end (the only
    reliable timing method through remote runtimes — docs/PERF.md
    "Measurement method");
  * sharded all-pairs weighted-Jaccard smash rate (cells/s), row blocks
    over the dp mesh (parallel/smash.sharded_pairwise_wjd);
  * exactness: the D-way sharded histogram summed across shards must
    bit-equal the 1-way histogram (the dp design's invariant).

On real multi-chip hardware this IS the scaling table. On a CPU host with
XLA_FLAGS=--xla_force_host_platform_device_count=N it proves the harness
end-to-end but the numbers are labeled VIRTUAL — virtual "devices" share
the same physical cores, so speedups there are fiction and are printed
only to validate the machinery (the label says so).

Usage:
    python scripts/scaling_bench.py [n_steps]
    # real chips:     run on the multi-chip host, no env needed
    # virtual check:  JAX_PLATFORMS=cpu \
    #                 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    #                 python scripts/scaling_bench.py
"""
import json
import sys
import time

import numpy as np


K, W, S = 21, 9, 42
NBINS = K ** 4
R_PER_DEV = 2048  # reads per device per step
L, READ_LEN = 160, 150
SMASH_N = 512


def stream_rate(ndev: int, n_steps: int) -> tuple[float, np.ndarray]:
    """reads/s of the dp-sharded stream at mesh width ndev; returns the
    final summed histogram for the exactness check."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hulk_tpu.ops.device_step import pallas_supported, stream_bucket
    from hulk_tpu.parallel.mesh import make_sharded_stream_step, make_sketch_mesh

    mesh = make_sketch_mesh(n_dp=ndev, n_mp=1, devices=jax.devices()[:ndev])
    R = ndev * R_PER_DEV
    rng = np.random.default_rng(0)
    # identical per-shard payload so every width streams the same bytes/chip
    shard = rng.integers(0, 4, (R_PER_DEV, L), dtype=np.uint8)
    shard[:, READ_LEN:] = 5
    codes = np.tile(shard, (ndev, 1))
    lengths = np.full(R, READ_LEN, dtype=np.int32)
    sh2 = NamedSharding(mesh, P("dp", None))
    sh1 = NamedSharding(mesh, P("dp"))
    dc = jax.device_put(codes, sh2)
    dl = jax.device_put(lengths, sh1)

    step = make_sharded_stream_step(
        mesh, k=K, w=W,
        bucket=stream_bucket(R_PER_DEV, R_PER_DEV * L, l=L, k=K, w=W),
        pallas=pallas_supported(),
    )

    def carries():
        hist = jax.device_put(jnp.zeros((ndev, NBINS), dtype=jnp.int32), sh2)
        count = jax.device_put(jnp.zeros(ndev, dtype=jnp.int64), sh1)
        kmv = jax.device_put(
            jnp.full((ndev, 1), 2**64 - 1, dtype=jnp.uint64), sh2
        )
        khf = jax.device_put(
            jnp.full((ndev, 1), 2**64 - 1, dtype=jnp.uint64), sh2
        )
        hmh = jax.device_put(jnp.zeros((ndev, 1), dtype=jnp.uint64), sh2)
        return hist, count, kmv, khf, hmh

    # compile + warm
    hist, count, kmv, khf, hmh = carries()
    hist, count, kmv, khf, hmh = step(hist, count, dc, dl, kmv, khf, hmh)
    _ = np.asarray(hist)

    hist, count, kmv, khf, hmh = carries()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        hist, count, kmv, khf, hmh = step(hist, count, dc, dl, kmv, khf, hmh)
    final = np.asarray(hist)  # forces the whole chain
    dt = time.perf_counter() - t0
    return n_steps * R / dt, final.astype(np.int64).sum(axis=0)


def smash_rate(ndev: int) -> float:
    from hulk_tpu.parallel.smash import sharded_pairwise_wjd

    rng = np.random.default_rng(3)
    mins = rng.integers(0, 1 << 40, (SMASH_N, S), dtype=np.int64)
    weights = rng.random((SMASH_N, S)) * 1e-3
    _ = sharded_pairwise_wjd(mins[:64], weights[:64], ndev=ndev)  # warm
    t0 = time.perf_counter()
    d = sharded_pairwise_wjd(mins, weights, ndev=ndev)
    dt = time.perf_counter() - t0
    assert d.shape == (SMASH_N, SMASH_N)
    return SMASH_N * SMASH_N / dt


def main() -> None:
    import os

    import jax

    import hulk_tpu._jax_config  # noqa: F401

    # this environment may pre-import jax at interpreter startup, making
    # the env var a no-op for backend selection (cli._apply_platform_env)
    plat = os.environ.get("HULK_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    backend = jax.default_backend()
    ndev_total = len(jax.devices())
    virtual = backend == "cpu"
    label = (
        "VIRTUAL (host-CPU device partitions — machinery check, NOT a "
        "performance claim)" if virtual else f"real {backend}"
    )
    print(f"# scaling_bench: {ndev_total} devices, {label}")

    widths = []
    d = 1
    while d <= ndev_total:
        widths.append(d)
        d *= 2
    if widths[-1] != ndev_total:
        widths.append(ndev_total)

    rows = []
    ref_hist = None
    for nd in widths:
        rate, hist = stream_rate(nd, n_steps)
        if ref_hist is None:
            ref_hist = hist
        else:
            # dp invariant: same per-shard payload => the summed histogram
            # is exactly nd * the 1-way histogram
            assert np.array_equal(hist, ref_hist * nd), (
                f"sharded histogram mismatch at D={nd}"
            )
        sm = smash_rate(nd)
        rows.append(
            dict(
                devices=nd,
                stream_reads_per_s=round(rate, 1),
                stream_reads_per_s_per_chip=round(rate / nd, 1),
                smash_cells_per_s=round(sm, 1),
                scaling_efficiency=round(
                    (rate / nd) / (rows[0]["stream_reads_per_s"] if rows else rate),
                    3,
                ),
            )
        )
        print(
            f"#  D={nd:3d}  stream {rate:12,.0f} reads/s "
            f"({rate / nd:12,.0f}/chip, eff {rows[-1]['scaling_efficiency']:.3f})  "
            f"smash {sm:12,.0f} cells/s"
        )

    print(json.dumps({"backend": backend, "virtual": virtual, "rows": rows}))


if __name__ == "__main__":
    main()
