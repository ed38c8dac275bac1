"""BASELINE config 5 demo: LSH-Forest similarity search over 100k
histosketches, sharded across an N-device mesh with replicated (allgathered)
queries.

Runs on the virtual CPU mesh by default (the environment exposes one physical
TPU chip); the sharding code is identical on a real multi-chip mesh.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/lsh_demo.py [n_sketches] [n_queries]
"""
import sys
import time

import numpy as np


def main(n=100_000, nq=64):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import hulk_tpu._jax_config  # noqa: F401
    from hulk_tpu.index.lshforest import LSHForest
    from hulk_tpu.parallel.lsh import sharded_lsh_search
    from hulk_tpu.parallel.mesh import make_sketch_mesh

    S = 42
    rng = np.random.default_rng(0)
    print(f"devices={len(jax.devices())} sketches={n} queries={nq}")

    t0 = time.perf_counter()
    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=0.9)
    mins = rng.integers(0, 2**40, (n, S), dtype=np.uint64)
    forest.add_batch([f"s{i}" for i in range(n)], mins)
    print(f"index build: {time.perf_counter()-t0:.1f}s "
          f"(bands={forest.n_bands} rows={forest.band_rows})")

    # queries: perturbations of random entries (planted near-duplicates)
    qidx = rng.choice(n, nq, replace=False)
    queries = mins[qidx].copy()
    for qi in range(nq):
        ch = rng.choice(S, 2, replace=False)
        queries[qi, ch] = rng.integers(0, 2**40, 2, dtype=np.uint64)

    mesh = make_sketch_mesh(n_dp=len(jax.devices()), n_mp=1)
    sharded_lsh_search(mesh, forest, queries[:4], thresh=0.9)  # compile warmup
    t0 = time.perf_counter()
    results = sharded_lsh_search(mesh, forest, queries, thresh=0.9)
    t_search = time.perf_counter() - t0
    found = sum(
        1 for qi, res in enumerate(results) if any(nm == f"s{qidx[qi]}" for nm, _ in res)
    )
    print(f"sharded search: {t_search:.2f}s ({nq/t_search:,.1f} queries/s vs "
          f"{n} entries; {n*nq/t_search:,.0f} pairs/s)")
    print(f"planted-neighbour recall: {found}/{nq}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(n, q)
