"""LSH Forest tests: banding math, recall above threshold, serialisation,
device-ranked batch search, CLI create/search."""
import numpy as np
import pytest

from hulk_tpu.index.lshforest import LSHForest, choose_bands

RNG = np.random.default_rng(13)
S = 42


def perturbed(base, n_changed):
    out = base.copy()
    idx = RNG.choice(S, n_changed, replace=False)
    out[idx] = RNG.integers(0, 2**40, n_changed, dtype=np.uint64)
    return out


def test_choose_bands_midpoint():
    b, r = choose_bands(42, 0.9)
    assert b * r <= 42 and b >= 1 and r >= 1
    mid = (1.0 / b) ** (1.0 / r) if b > 1 else 1.0
    assert abs(mid - 0.9) < 0.15


def test_search_recall_and_precision():
    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=0.7)
    base = RNG.integers(0, 2**40, S, dtype=np.uint64)
    near = perturbed(base, 4)     # sim ~0.90
    far = perturbed(base, 35)     # sim ~0.17
    forest.add("near", near)
    forest.add("far", far)
    for i in range(20):
        forest.add(f"rand{i}", RNG.integers(0, 2**40, S, dtype=np.uint64))
    hits = forest.search(base)
    names = [h[0] for h in hits]
    assert "near" in names
    assert "far" not in names
    assert hits[0][1] >= 0.7


def test_roundtrip(tmp_path):
    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=0.8)
    rows = [RNG.integers(0, 2**40, S, dtype=np.uint64) for _ in range(5)]
    for i, r in enumerate(rows):
        forest.add(f"s{i}", r)
    p = str(tmp_path / "idx.json")
    forest.write_json(p)
    loaded = LSHForest.load_json(p)
    assert loaded.names == forest.names
    assert np.array_equal(loaded.mins_matrix, forest.mins_matrix)
    assert loaded.search(rows[2])[0][0] == "s2"


def test_batch_device_search_matches_scalar():
    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=0.5)
    base = RNG.integers(0, 2**40, S, dtype=np.uint64)
    forest.add("a", base)
    forest.add("b", perturbed(base, 10))
    for i in range(30):
        forest.add(f"r{i}", RNG.integers(0, 2**40, S, dtype=np.uint64))
    queries = np.stack([base, perturbed(base, 3)])
    batch = forest.search_batch_device(queries)
    for qi in range(2):
        scalar = forest.search(queries[qi])
        assert [(n, round(s, 12)) for n, s in batch[qi]] == [
            (n, round(s, 12)) for n, s in scalar
        ]


def test_cli_index_create_and_search(tmp_path):
    import os
    import shutil

    golden = os.path.join(os.path.dirname(__file__), "golden")
    for f in ("fixture-default.json", "part1.json", "part2.json"):
        shutil.copy(os.path.join(golden, f), tmp_path / f)
    from tests.test_cli_golden import run_cli

    run_cli(["index", "-r", "create", "-n", "my.idx", "-d", ".", "-j", "0.5"], tmp_path)
    assert (tmp_path / "my.idx").exists()
    # search the index with the same sketches: each should match itself (sim 1.0)
    import io
    import sys
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_cli(["index", "-r", "search", "-n", "my.idx", "-d", ".", "-j", "0.9"], tmp_path)
    lines = [
        l for l in buf.getvalue().splitlines() if l.count(",") == 2 and ".json," in l
    ]
    assert len(lines) == 3  # one self-hit per sketch at j=0.9
    for line in lines:
        q, hit, sim = line.split(",")
        assert os.path.basename(q) == os.path.basename(hit)
        assert float(sim) == 1.0


def test_sharded_search_matches_scalar():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hulk_tpu.parallel.lsh import sharded_lsh_search
    from hulk_tpu.parallel.mesh import make_sketch_mesh

    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=0.5)
    base = RNG.integers(0, 2**40, S, dtype=np.uint64)
    forest.add("a", base)
    forest.add("b", perturbed(base, 8))
    for i in range(29):  # 31 total -> exercises shard padding
        forest.add(f"r{i}", RNG.integers(0, 2**40, S, dtype=np.uint64))
    queries = np.stack([base, perturbed(base, 2)])
    mesh = make_sketch_mesh(n_dp=8, n_mp=1)
    sharded = sharded_lsh_search(mesh, forest, queries)
    for qi in range(2):
        scalar = forest.search(queries[qi])
        assert [(n, round(s, 12)) for n, s in sharded[qi]] == [
            (n, round(s, 12)) for n, s in scalar
        ]


def test_add_batch_matches_sequential_and_b64_roundtrip(tmp_path):
    from hulk_tpu.index.lshforest import LSHForest

    rng = np.random.default_rng(8)
    S, N = 16, 300
    mins = rng.integers(0, 2**40, (N, S), dtype=np.uint64)
    fa = LSHForest(kmer_size=11, sketch_size=S, jaccard_thresh=0.8)
    for i in range(N):
        fa.add(f"s{i}", mins[i])
    fb = LSHForest(kmer_size=11, sketch_size=S, jaccard_thresh=0.8)
    fb.add_batch([f"s{i}" for i in range(N)], mins)
    q = mins[17].copy()
    q[3] = 12345
    assert np.array_equal(fa.candidates(q), fb.candidates(q))
    assert fa.search(q) == fb.search(q)

    # base64 serialisation roundtrip preserves everything
    p = tmp_path / "idx.json"
    fb.write_json(str(p))
    fc = LSHForest.load_json(str(p))
    assert fc.names == fb.names
    assert np.array_equal(fc.mins_matrix, fb.mins_matrix)
    assert fc.search(q) == fb.search(q)

    # round-1 nested-int-list format still loads
    import json

    doc = json.load(open(p))
    doc.pop("mins_b64")
    doc["mins"] = [[int(v) for v in row] for row in mins]
    p2 = tmp_path / "idx_legacy.json"
    json.dump(doc, open(p2, "w"))
    fd = LSHForest.load_json(str(p2))
    assert fd.search(q) == fb.search(q)
