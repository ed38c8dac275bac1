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


def _corpus_at_levels(rng, s, levels, per_level, n_noise):
    """(query, names, mins, true_sims): items constructed at controlled
    positional similarity to the query (keep round(s*level) slots, replace
    the rest with unique random values), plus pure-noise rows."""
    q = rng.integers(1, 1 << 60, s, dtype=np.uint64)
    rows, sims, names = [], [], []
    for lv in levels:
        keep = int(round(s * lv))
        for i in range(per_level):
            r = rng.integers(1 << 61, 1 << 62, s, dtype=np.uint64)
            pos = rng.permutation(s)[:keep]
            r[pos] = q[pos]
            rows.append(r)
            sims.append(keep / s)
            names.append(f"lv{lv:.2f}_{i}")
    for i in range(n_noise):
        rows.append(rng.integers(1 << 61, 1 << 62, s, dtype=np.uint64))
        sims.append(0.0)
        names.append(f"noise_{i}")
    return q, names, np.stack(rows), np.asarray(sims)


def test_forest_recall_precision_curves():
    """Threshold `search` characterised at 3 thresholds: recall of
    well-above-threshold items >= 0.9 per banding's S-curve, precision
    exactly 1.0 (candidates are re-ranked by the exact positional
    estimate, so nothing below t survives), and the banding prefilter
    rejects most far-below-threshold rows."""
    from hulk_tpu.index.lshforest import LSHForest

    rng = np.random.default_rng(17)
    s = 42
    levels = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    q, names, mins, sims = _corpus_at_levels(rng, s, levels, 40, 200)
    for t in (0.5, 0.7, 0.9):
        forest = LSHForest(kmer_size=21, sketch_size=s, jaccard_thresh=t)
        forest.add_batch(list(names), mins)
        hits = dict(forest.search(q, thresh=t))
        above = [n for n, sv in zip(names, sims) if sv >= t + 0.1]
        got = sum(1 for n in above if n in hits)
        assert got >= 0.9 * len(above), f"t={t}: recall {got}/{len(above)}"
        # precision is exact by construction: assert nothing below t returned
        name_sim = dict(zip(names, sims))
        assert all(name_sim[n] >= t for n in hits), f"t={t}: below-threshold hit"
        # prefilter selectivity: far-below rows mostly never become candidates
        cand = set(forest.candidates(q).tolist())
        far_below = [i for i, sv in enumerate(sims) if sv <= t - 0.3]
        leaked = sum(1 for i in far_below if i in cand)
        assert leaked <= 0.5 * len(far_below), f"t={t}: prefilter leaked {leaked}"


def test_forest_topk_prefix_descent_matches_bruteforce():
    """query_topk needs no threshold: prefix descent must surface the exact
    brute-force top-k (modulo ties at the k-th similarity)."""
    from hulk_tpu.index.lshforest import LSHForest

    rng = np.random.default_rng(23)
    s = 42
    q, names, mins, sims = _corpus_at_levels(
        rng, s, [0.15, 0.35, 0.55, 0.75, 0.95], 30, 300
    )
    forest = LSHForest(kmer_size=21, sketch_size=s, jaccard_thresh=0.7)
    forest.add_batch(list(names), mins)
    for k in (1, 5, 15):
        got = forest.query_topk(q, k)
        assert len(got) == k
        exact = (mins == q[None, :]).mean(axis=1)
        kth = np.sort(exact)[::-1][k - 1]
        # every returned item at least as similar as the k-th exact, and
        # every strictly-above-kth item present
        name_sim = dict(zip(names, exact))
        assert all(name_sim[n] >= kth for n, _ in got)
        must = {n for n, e in zip(names, exact) if e > kth}
        assert must.issubset({n for n, _ in got})
        # ranked descending
        simvals = [v for _, v in got]
        assert simvals == sorted(simvals, reverse=True)


def test_forest_topk_after_incremental_add():
    """Prefix trees rebuild after add_batch invalidates them."""
    from hulk_tpu.index.lshforest import LSHForest

    rng = np.random.default_rng(31)
    s = 42
    q, names, mins, _ = _corpus_at_levels(rng, s, [0.9], 3, 20)
    forest = LSHForest(kmer_size=21, sketch_size=s, jaccard_thresh=0.7)
    forest.add_batch(list(names), mins)
    _ = forest.query_topk(q, 2)
    forest.add("exact_dup", q)
    got = forest.query_topk(q, 1)
    assert got[0][0] == "exact_dup" and got[0][1] == 1.0


def test_scale_recall_vs_bruteforce_device_ranking():
    """BASELINE config 5 acceptance: LSH search recall measured against the
    brute-force sharded device ranking (every row with positional similarity
    >= thresh), at a 20k-corpus / 200-query scale. Precision is exact by
    construction (candidates are re-scored with the exact similarity)."""
    import jax

    from hulk_tpu.parallel.lsh import sharded_lsh_search, sharded_sims
    from hulk_tpu.parallel.mesh import make_sketch_mesh

    S, t, n, nq = 42, 0.9, 20_000, 200
    rng = np.random.default_rng(7)
    mins = rng.integers(0, 2**40, (n, S), dtype=np.uint64)
    qidx = rng.choice(n, nq, replace=False)
    queries = mins[qidx].copy()
    for qi in range(nq):
        ch = rng.choice(S, 2, replace=False)
        queries[qi, ch] = rng.integers(0, 2**40, 2, dtype=np.uint64)
    forest = LSHForest(kmer_size=21, sketch_size=S, jaccard_thresh=t)
    forest.add_batch([f"s{i}" for i in range(n)], mins)

    mesh = make_sketch_mesh(n_dp=len(jax.devices()), n_mp=1)
    results = sharded_lsh_search(mesh, forest, queries, thresh=t)
    sims, _ = sharded_sims(mesh, forest, queries)  # brute-force ground truth

    n_truth = n_hit = 0
    for qi in range(nq):
        truth = set(np.flatnonzero(sims[qi] >= t))
        got = set(int(nm[1:]) for nm, _ in results[qi])
        assert got <= truth  # precision 1.0: exact re-scoring can't overshoot
        n_truth += len(truth)
        n_hit += len(got & truth)
        # returned similarities match the brute-force values exactly
        for nm, v in results[qi]:
            assert v == sims[qi, int(nm[1:])]
    assert n_truth >= nq  # every planted neighbour is above thresh
    assert n_hit / n_truth >= 0.95


def test_cli_index_search_with_index_in_sketch_dir(tmp_path, capsys):
    """The index file living inside the sketch directory must be skipped
    when collecting query sketches (and any other non-sketch JSON must fail
    with the reference's validation error, not a KeyError)."""
    import json
    import os

    import pytest as _pytest

    from hulk_tpu import cli
    from hulk_tpu.io.sketchio import SketchIOError, load_hulk_data

    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    if not os.path.exists(fixture):
        _pytest.skip("fixture missing")
    cli.main([
        "sketch", "-f", fixture, "-o", str(tmp_path / "s1"), "-k", "11", "-s", "8",
    ])
    cli.main([
        "index", "-r", "create", "-n", str(tmp_path / "idx.json"),
        "-d", str(tmp_path), "-k", "11", "-s", "8",
    ])
    cli.main([
        "index", "-r", "search", "-n", str(tmp_path / "idx.json"),
        "-d", str(tmp_path), "-k", "11", "-s", "8",
    ])
    out = capsys.readouterr().out
    assert "s1.json" in out

    # non-sketch JSON -> SketchIOError (Go zero-fills missing fields and
    # fails validation), never a raw KeyError
    bad = tmp_path / "not_a_sketch.json"
    bad.write_text(json.dumps({"whatever": 1}))
    with _pytest.raises(SketchIOError):
        load_hulk_data(str(bad))
