"""Sketch-layer tests: spectrum semantics, CMS vs scalar reference behaviour,
histosketch batch-vs-scalar equality, minhash variants, sketchio roundtrip."""
import numpy as np
import pytest

from hulk_tpu.hashes.cws import build_cws_tables
from hulk_tpu.io.sketchio import HULKData, SketchIOError, load_hulk_data, md5sum_u64
from hulk_tpu.sketch.countmin import CountMinSketch, cms_shape
from hulk_tpu.sketch.histosketch import HistoSketch
from hulk_tpu.sketch.minhash import KHFSketch, KMVSketch
from hulk_tpu.sketch.spectrum import KmerSpectrum, SpectrumError


def test_cms_shape_matches_reference():
    assert cms_shape() == (7, 2000)


def test_cms_scalar_vs_batch():
    rng = np.random.default_rng(0)
    bins = rng.integers(0, 10000, 500, dtype=np.uint64)
    freqs = rng.integers(1, 50, 500).astype(np.float64)
    a = CountMinSketch()
    esti_scalar = np.array([a.add(int(b), float(f)) for b, f in zip(bins, freqs)])
    b = CountMinSketch()
    from hulk_tpu.sketch.countmin import cms_row_bins

    rb = cms_row_bins(bins, b.depth, b.width)
    esti_batch = b.add_many(rb, freqs)
    assert np.array_equal(esti_scalar, esti_batch)
    assert np.array_equal(a.sketch, b.sketch)


def test_cms_decay():
    c = CountMinSketch(decay_ratio=0.5)
    assert c.apply_scaling
    v1 = c.add(42, 1.0)
    v2 = c.add(42, 1.0)
    # second add decays the old counter then increments: v2 = v1*e^-0.5 + 1
    assert v2 == pytest.approx(v1 * c.decay_weight + 1.0, rel=0, abs=0)


def test_spectrum_dump_rules():
    s = KmerSpectrum(1000)
    with pytest.raises(SpectrumError, match="empty"):
        s.dump()
    s.bins[5] = 3.0
    with pytest.raises(SpectrumError, match="not used yet"):
        s.dump()  # 1/1000 < 1%
    s.bins[: 20] = 1.0
    ids, freqs = s.dump()
    assert ids.tolist() == list(range(20))
    assert s.cardinality() == 20
    s.wipe()
    assert s.cardinality() == 0


def test_histosketch_batch_matches_scalar():
    dims = 512
    tables = build_cws_tables(8, dims)
    rng = np.random.default_rng(1)
    bins = np.sort(rng.choice(dims, 64, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 30, 64).astype(np.float64)

    h1 = HistoSketch(21, 8, dims, 1.0, tables=tables)
    for b, f in zip(bins, freqs):
        h1.add_element(int(b), float(f))
    h2 = HistoSketch(21, 8, dims, 1.0, tables=tables)
    h2.add_elements(bins, freqs)
    assert np.array_equal(h1.sketch, h2.sketch)
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)


def test_histosketch_concept_drift_batch_matches_scalar():
    dims = 256
    tables = build_cws_tables(6, dims)
    rng = np.random.default_rng(2)
    bins = np.sort(rng.choice(dims, 40, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 10, 40).astype(np.float64)
    h1 = HistoSketch(21, 6, dims, 0.2, tables=tables)
    for b, f in zip(bins, freqs):
        h1.add_element(int(b), float(f))
    h2 = HistoSketch(21, 6, dims, 0.2, tables=tables)
    h2.add_elements(bins, freqs)
    assert np.array_equal(h1.sketch, h2.sketch)
    assert np.array_equal(h1.sketch_weights, h2.sketch_weights)


def test_histosketch_param_checks():
    with pytest.raises(ValueError):
        HistoSketch(32, 4, 100, 1.0)
    with pytest.raises(ValueError):
        HistoSketch(21, 4, 100, 1.5)
    with pytest.raises(ValueError):
        HistoSketch(21, 4, 1, 1.0)


def test_kmv_bottom_k():
    k = KMVSketch(21, 5)
    vals = np.array([50, 10, 40, 10, 30, 20, 60, 5], dtype=np.uint64)
    k.add_hashes(vals)
    assert k.get_sketch().tolist() == [5, 10, 10, 20, 30]  # duplicates kept
    k2 = KMVSketch(21, 5)
    for v in vals:
        k2.add_hash(int(v))
    assert np.array_equal(k.get_sketch(), k2.get_sketch())
    assert k.get_similarity(k2) == 1.0


def test_khf():
    h = KHFSketch(21, 4)
    h.add_hashes(np.array([7, 3], dtype=np.uint64))
    # slot i minimum of (1+i)*hv mod 2^64
    exp = [min((1 + i) * 7 % 2**64, (1 + i) * 3 % 2**64) for i in range(4)]
    assert h.get_sketch().tolist() == exp
    h2 = KHFSketch(21, 4)
    h2.add_hashes(np.array([3], dtype=np.uint64))
    assert 0.0 <= h.get_similarity(h2) <= 1.0


def test_md5sum_u64():
    # matches Go helpers.MD5sum: little-endian words
    import hashlib

    arr = np.array([1, 2**63], dtype=np.uint64)
    exp = hashlib.md5(arr.astype("<u8").tobytes()).hexdigest()
    assert md5sum_u64(arr) == exp


def test_sketchio_roundtrip(tmp_path):
    dims = 256
    tables = build_cws_tables(4, dims)
    h = HistoSketch(21, 4, dims, 1.0, tables=tables)
    h.add_elements(np.arange(10, dtype=np.int64), np.ones(10))
    kmv = KMVSketch(21, 4)
    kmv.add_hashes(np.array([2**63, 5, 9, 1, 7], dtype=np.uint64))
    data = HULKData(filename="x.fq,", banner="lbl")
    data.add(h)
    data.add(kmv)
    p = str(tmp_path / "s.json")
    data.write_json(p)
    loaded = load_hulk_data(p)
    hs = loaded.find_sketch(21, "histosketch")
    assert np.array_equal(hs.mins, h.get_sketch())
    assert np.array_equal(hs.weights, h.sketch_weights)
    km = loaded.find_sketch(21, "kmv")
    assert km.mins.tolist() == [1, 5, 7, 9]  # sorted ascending, full u64 ok... bottom-4
    # distances: identical files -> distance 0
    assert loaded.get_distance(loaded, "jaccard", 21, "histosketch") == 0.0
    assert loaded.get_distance(loaded, "weightedjaccard", 21, "histosketch") == 0.0


def test_sketchio_validation(tmp_path):
    p = str(tmp_path / "bad.json")
    with open(p, "w") as fh:
        fh.write('{"class":"nope","filename":"","hash_function":"x","license":"","signatures":[{"Algorithm":"khf","Sketch":{"ksize":21,"md5sum":"00","mins":[1],"num":1}}],"version":"1.0.0","banner_label":""}')
    with pytest.raises(SketchIOError):
        load_hulk_data(p)


def test_empty_sketch_rejected():
    data = HULKData()
    kmv = KMVSketch(21, 4)  # never fed
    with pytest.raises(SketchIOError, match="no sketch was generated"):
        data.add(kmv)


def test_cms_add_many_jax_matches_reference():
    rng = np.random.default_rng(3)
    bins = rng.integers(0, 10000, 700, dtype=np.uint64)
    freqs = rng.integers(1, 50, 700).astype(np.float64)
    from hulk_tpu.sketch.countmin import cms_row_bins

    for decay in (1.0, 0.3):
        a = CountMinSketch(decay_ratio=decay)
        b = CountMinSketch(decay_ratio=decay)
        rb = cms_row_bins(bins, a.depth, a.width)
        ea = a.add_many(rb, freqs)
        eb = b.add_many_reference(rb, freqs)
        assert np.array_equal(ea, eb)
        assert np.array_equal(a.sketch, b.sketch)


def test_cms_row_bins_table(tmp_path, monkeypatch):
    monkeypatch.setenv("HULK_TPU_CACHE", str(tmp_path))
    from hulk_tpu.sketch import countmin as cm

    cm._row_bins_table_cache.clear()
    t1 = cm.cms_row_bins_table(500, 7, 2000)
    direct = cm.cms_row_bins(np.arange(500, dtype=np.uint64), 7, 2000)
    assert np.array_equal(t1, direct)
    cm._row_bins_table_cache.clear()
    t2 = cm.cms_row_bins_table(500, 7, 2000)  # disk hit
    assert np.array_equal(t1, t2)
    cm._row_bins_table_cache.clear()


def test_hyperminhash_estimates():
    from hulk_tpu.sketch.hyperminhash import HyperMinHash

    rng = np.random.default_rng(4)
    a_set = rng.integers(0, 2**64, 20000, dtype=np.uint64)
    b_extra = rng.integers(0, 2**64, 20000, dtype=np.uint64)
    h1 = HyperMinHash(21)
    h1.add_hashes(a_set)
    # cardinality within ~10%
    card = h1.cardinality()
    assert 0.85 * 20000 < card < 1.15 * 20000
    # self-similarity == 1
    assert h1.get_similarity(h1) == 1.0
    # half-overlapping set: J = 1/3
    h2 = HyperMinHash(21)
    h2.add_hashes(np.concatenate([a_set[:10000], b_extra]))
    j = h1.get_similarity(h2)
    assert 0.18 < j < 0.5  # true J = 10000/30000 = 0.333
    # disjoint sets: J ~ 0
    h3 = HyperMinHash(21)
    h3.add_hashes(b_extra)
    assert h1.get_similarity(h3) < 0.05
    # merge = union
    h4 = HyperMinHash(21)
    h4.add_hashes(a_set[:10000])
    h4.merge(h3)
    assert np.array_equal(
        h4.registers,
        HyperMinHash(21).registers * 0 + np.maximum(
            h2.registers * 0 + _regs(a_set[:10000]), _regs(b_extra)
        ),
    )


def _regs(vals):
    from hulk_tpu.sketch.hyperminhash import HyperMinHash

    h = HyperMinHash(21)
    h.add_hashes(vals)
    return h.registers


def test_hyperminhash_roundtrip(tmp_path):
    from hulk_tpu.sketch.hyperminhash import HyperMinHash

    rng = np.random.default_rng(5)
    h = HyperMinHash(21)
    h.add_hashes(rng.integers(0, 2**64, 5000, dtype=np.uint64))
    data = HULKData(filename="f", banner="b")
    data.add(h)
    p = str(tmp_path / "hmh.json")
    data.write_json(p)
    loaded = load_hulk_data(p)
    d_self = loaded.get_distance(loaded, "jaccard", 21, "hyperminhash")
    assert d_self == 0.0


def test_hyperminhash_low_bit_inputs():
    """Minimizer values occupy only ~2k+8 low bits; the internal mixer must
    spread them across buckets (regression: everything landed in bucket 0)."""
    from hulk_tpu.sketch.hyperminhash import HyperMinHash

    rng = np.random.default_rng(6)
    a = rng.integers(0, 2**50, 20000, dtype=np.uint64)  # k=21-style values
    b = rng.integers(0, 2**50, 20000, dtype=np.uint64)
    ha, hb, hu = HyperMinHash(21), HyperMinHash(21), HyperMinHash(21)
    ha.add_hashes(a)
    hb.add_hashes(b)
    hu.add_hashes(np.concatenate([a, a[:0], b]))
    assert (ha.registers != 0).sum() > 900  # buckets actually populated
    assert ha.get_similarity(hb) < 0.05  # disjoint
    j = ha.get_similarity(hu)  # J = |A|/|A u B| ~ 0.5
    assert 0.3 < j < 0.7
    card = ha.cardinality()
    assert 0.85 * 20000 < card < 1.15 * 20000


def test_drift_subnormal_squash_is_output_exact():
    """Drift decay squashes subnormal counter results to +0 (FTZ in the
    native flush, explicit in the Python paths). Prove it is OUTPUT-exact vs
    Go's keep-the-subnormals semantics: run long enough that counters cross
    the subnormal range between touches (decay 0.9 -> subnormal after ~790
    elements) and compare every post-increment CMS estimate and the final
    flush outputs against a raw numpy reference that keeps subnormals."""
    from hulk_tpu.hashes.cws import build_cws_tables
    from hulk_tpu.hashes.fdlibm import go_exp
    from hulk_tpu.sketch.countmin import CountMinSketch, cms_row_bins
    from hulk_tpu.sketch.histosketch import HistoSketch

    dims, n, s, decay = 4096, 1500, 6, 0.9
    rng = np.random.default_rng(3)
    bins = np.sort(rng.choice(dims, n, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 50, n).astype(np.float64)

    cms = CountMinSketch(decay_ratio=decay)
    rb = cms_row_bins(bins.astype(np.uint64), cms.depth, cms.width)

    # raw reference: Go semantics verbatim, subnormals kept
    q = np.zeros((cms.depth, cms.width), dtype=np.float64)
    dw = float(go_exp(-decay))
    rows = np.arange(cms.depth)
    raw_estis = np.empty(n)
    for i in range(n):
        q *= dw
        cols = rb[:, i]
        q[rows, cols] += freqs[i]
        raw_estis[i] = q[rows, cols].min()
    assert (q[(q != 0) & (q < np.finfo(np.float64).tiny)].size) > 0, (
        "scenario failed to produce subnormal counters; strengthen it"
    )

    got_estis = cms.add_many(rb, freqs)
    assert np.array_equal(got_estis, raw_estis)

    # and through the full flush (native path when available)
    tables = build_cws_tables(s, dims)
    hs = HistoSketch(21, s, dims, decay, tables=tables)
    hs.add_elements(bins, freqs)

    hs2 = HistoSketch(21, s, dims, decay, tables=tables)
    for i in range(n):  # element-at-a-time scalar path
        hs2.add_element(int(bins[i]), float(freqs[i]))
    assert np.array_equal(hs.sketch, hs2.sketch)
    assert np.array_equal(hs.sketch_weights, hs2.sketch_weights)


def test_hyperminhash_bias_variance_sweep():
    """Estimator vs exact Jaccard across cardinality ratios 1:1 to 1:100
    (paper arXiv:1710.08436 §3.3). Tolerance is DERIVED, not hand-tuned:
    the matching-register count C is a sum over u union-occupied buckets of
    nearly independent Bernoullis with mean ~ J + EC/u, so
    sd(J_est) ~= sqrt(J(1-J)/u), plus Poisson noise sqrt(EC)/u from the
    collision term; each case must land within 5 combined sd. A second
    pass averages 5 seeds and requires the BIAS within 2 sd/sqrt(5)."""
    from hulk_tpu.sketch.hyperminhash import HyperMinHash

    # (|A|, |B|, |A intersect B|): ratios 1:1, 1:10, 1:100
    cases = [
        (30_000, 30_000, 10_000),   # J = 0.2
        (50_000, 5_000, 2_500),     # J ~= 0.0476, ratio 10
        (100_000, 1_000, 500),      # J ~= 0.00498, ratio 100
        (50_000, 5_000, 0),         # J = 0, ratio 10
    ]
    for na, nb, nov in cases:
        j_exact = nov / (na + nb - nov)
        errs = []
        tol = None
        for seed in range(5):
            rng = np.random.default_rng(1000 + seed)
            pool = rng.integers(0, 2**64, na + nb - nov, dtype=np.uint64)
            a_vals = pool[:na]
            b_vals = np.concatenate([pool[:nov], pool[na:]])
            assert b_vals.shape[0] == nb
            ha, hb = HyperMinHash(21), HyperMinHash(21)
            ha.add_hashes(a_vals)
            hb.add_hashes(b_vals)
            est = ha.get_similarity(hb)
            u = int(np.count_nonzero((ha.registers != 0) | (hb.registers != 0)))
            ec = ha.expected_collisions(float(na), float(nb))
            sd = np.sqrt(max(j_exact * (1 - j_exact), 1.0 / u) / u) + np.sqrt(max(ec, 1.0)) / u
            tol = 5 * sd
            errs.append(est - j_exact)
            assert abs(est - j_exact) <= tol, (
                f"case {(na, nb, nov)} seed {seed}: est {est} vs {j_exact} "
                f"(tol {tol})"
            )
        bias = float(np.mean(errs))
        assert abs(bias) <= 2 * tol / np.sqrt(5) + 1e-3, (
            f"case {(na, nb, nov)}: bias {bias} exceeds {2 * tol / np.sqrt(5)}"
        )
