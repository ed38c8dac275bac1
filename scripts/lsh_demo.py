"""BASELINE config 5 demo at scale: LSH-Forest similarity search over 100k
histosketches, sharded over an N-device mesh AND over jax.distributed
processes, with recall measured against the brute-force device ranking.

Runs on the virtual CPU mesh by default (the environment exposes one physical
TPU chip); the sharding code is identical on a real multi-chip mesh.

Single-process (8 virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/lsh_demo.py [n_sketches] [n_queries]

Two jax.distributed processes (this script spawns them):
    python scripts/lsh_demo.py --spawn2 [n_sketches] [n_queries]
"""
import os
import sys
import time

import numpy as np

S = 42
THRESH = 0.9


def make_corpus(n, nq, rng):
    mins = rng.integers(0, 2**40, (n, S), dtype=np.uint64)
    qidx = rng.choice(n, nq, replace=False)
    queries = mins[qidx].copy()
    for qi in range(nq):  # plant near-duplicates at jaccard ~0.95
        ch = rng.choice(S, 2, replace=False)
        queries[qi, ch] = rng.integers(0, 2**40, 2, dtype=np.uint64)
    return mins, queries, qidx


def main(n=100_000, nq=1000):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import hulk_tpu._jax_config  # noqa: F401
    from hulk_tpu.index.lshforest import LSHForest
    from hulk_tpu.parallel.lsh import sharded_lsh_search, sharded_sims
    from hulk_tpu.parallel.mesh import make_sketch_mesh

    rng = np.random.default_rng(0)
    print(f"devices={len(jax.devices())} sketches={n} queries={nq}")
    mins, queries, qidx = make_corpus(n, nq, rng)

    t0 = time.perf_counter()
    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=THRESH)
    forest.add_batch([f"s{i}" for i in range(n)], mins)
    t_build = time.perf_counter() - t0
    print(f"index build: {t_build:.1f}s (bands={forest.n_bands} rows={forest.band_rows})")

    mesh = make_sketch_mesh(n_dp=len(jax.devices()), n_mp=1)
    sharded_lsh_search(mesh, forest, queries[:4], thresh=THRESH)  # compile warmup
    t0 = time.perf_counter()
    results = sharded_lsh_search(mesh, forest, queries, thresh=THRESH)
    t_search = time.perf_counter() - t0
    print(
        f"sharded search: {t_search:.2f}s ({nq/t_search:,.1f} queries/s vs "
        f"{n} entries; {n*nq/t_search:,.0f} ranked pairs/s)"
    )

    # recall vs the brute-force device ranking: every corpus row with
    # positional similarity >= THRESH, no LSH filter
    sims, _ = sharded_sims(mesh, forest, queries)
    truth = [set(np.flatnonzero(sims[qi] >= THRESH)) for qi in range(nq)]
    got = [set(int(nm[1:]) for nm, _ in results[qi]) for qi in range(nq)]
    n_truth = sum(len(t) for t in truth)
    n_hit = sum(len(t & g) for t, g in zip(truth, got))
    planted = sum(1 for qi in range(nq) if int(qidx[qi]) in got[qi])
    print(
        f"brute-force recall: {n_hit}/{n_truth} = {n_hit/max(n_truth,1):.4f}; "
        f"planted-neighbour recall: {planted}/{nq}"
    )


def worker(n, nq):
    """One jax.distributed process: index a stripe, search, merge top-K."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hulk_tpu.parallel.distributed import init_distributed

    init_distributed()
    import hulk_tpu._jax_config  # noqa: F401
    from hulk_tpu.index.lshforest import LSHForest
    from hulk_tpu.parallel.lsh import multiprocess_lsh_search

    rng = np.random.default_rng(0)
    mins, queries, qidx = make_corpus(n, nq, rng)
    pid, nproc = jax.process_index(), jax.process_count()
    stripe = np.arange(n)[pid::nproc]

    t0 = time.perf_counter()
    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=THRESH)
    forest.add_batch([f"s{i}" for i in stripe], mins[stripe])
    t_build = time.perf_counter() - t0

    multiprocess_lsh_search(forest, queries[:4], stripe.astype(np.int64))  # warmup
    t0 = time.perf_counter()
    res = multiprocess_lsh_search(forest, queries, stripe.astype(np.int64))
    t_search = time.perf_counter() - t0
    if pid == 0:
        planted = sum(1 for qi in range(nq) if any(i == int(qidx[qi]) for i, _ in res[qi]))
        print(
            f"2-process search: stripe build {t_build:.1f}s/proc; search "
            f"{t_search:.2f}s ({nq/t_search:,.1f} queries/s vs {n} entries, "
            f"{nproc} procs); planted-neighbour recall: {planted}/{nq}"
        )


def spawn2(n, nq):
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            HULK_COORDINATOR=f"127.0.0.1:{port}",
            HULK_NUM_PROCS="2",
            HULK_PROC_ID=str(pid),
            HULK_LSH_WORKER=f"{n},{nq}",
            # this environment's TPU-tunnel plugin interposes compiles;
            # concurrent distributed CPU compiles serialize through it
            PALLAS_AXON_POOL_IPS="",
        )
        procs.append(subprocess.Popen([sys.executable, os.path.abspath(__file__)], env=env))
    for p in procs:
        p.wait()
        assert p.returncode == 0


if __name__ == "__main__":
    if os.environ.get("HULK_LSH_WORKER"):
        wn, wq = map(int, os.environ["HULK_LSH_WORKER"].split(","))
        worker(wn, wq)
        sys.exit(0)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 100_000
    q = int(args[1]) if len(args) > 1 else 1000
    if "--spawn2" in sys.argv:
        spawn2(n, q)
    else:
        main(n, q)
