"""CLI-level regression tests against pinned goldens.

The goldens are SELF-GENERATED (no Go toolchain exists in this image to
produce reference outputs — see SURVEY.md §4); they pin the full pipeline
(fixture -> minimizers -> spectrum -> histosketch -> JSON -> smash CSV) so
any behavioural drift is caught. The RNG/transcendental substrate underneath
is independently validated against known Go outputs (test_gorand/test_gojson).

These run the real CLI main() in-process on the bundled reference fixture.
"""
import filecmp
import os
import shutil

import pytest

FIXTURE = "/root/reference/testing/test-reads-small.fq.gz"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not mounted"
)


def run_cli(args, tmp_path, stdin_bytes=None):
    import io
    import sys

    from hulk_tpu.cli import main

    old_cwd = os.getcwd()
    os.chdir(tmp_path)
    old_stdin = sys.stdin
    try:
        if stdin_bytes is not None:
            sys.stdin = io.TextIOWrapper(io.BytesIO(stdin_bytes))
        assert main(args) == 0
    finally:
        sys.stdin = old_stdin
        os.chdir(old_cwd)
        # -p 1 runs set the process-wide OpenMP thread count; restore so
        # later tests keep the parallel native passes
        from hulk_tpu import native

        native.set_threads(os.cpu_count() or 1)


def test_sketch_fixture_matches_golden(tmp_path):
    run_cli(["sketch", "-f", FIXTURE, "-o", "out", "-p", "1"], tmp_path)
    got = (tmp_path / "out.json").read_bytes()
    exp = open(os.path.join(GOLDEN, "fixture-default.json"), "rb").read()
    assert got == exp


def test_smash_matches_golden(tmp_path):
    for f in ("fixture-default.json", "part1.json", "part2.json"):
        shutil.copy(os.path.join(GOLDEN, f), tmp_path / f)
    run_cli(["smash", "-d", ".", "-m", "weightedjaccard", "-o", "wj"], tmp_path)
    run_cli(["smash", "-d", ".", "-m", "jaccard", "-o", "jac"], tmp_path)
    got_wj = (tmp_path / "wj.hulk-matrix.csv").read_text()
    got_j = (tmp_path / "jac.hulk-matrix.csv").read_text()
    exp_wj = open(os.path.join(GOLDEN, "wj.hulk-matrix.csv")).read()
    exp_j = open(os.path.join(GOLDEN, "jac.hulk-matrix.csv")).read()
    assert got_wj == exp_wj
    assert got_j == exp_j


def test_version_subcommand(capsys):
    from hulk_tpu.cli import main

    assert main(["version"]) == 0
    assert capsys.readouterr().out.strip() == "1.0.0"


def test_sketch_rejects_bad_extension(tmp_path):
    bad = tmp_path / "reads.txt"
    bad.write_text("@r\nACGT\n+\nFFFF\n")
    with pytest.raises(SystemExit):
        run_cli(["sketch", "-f", str(bad), "-o", "x"], tmp_path)


def test_smash_requires_two_sketches(tmp_path):
    shutil.copy(os.path.join(GOLDEN, "part1.json"), tmp_path / "only.json")
    with pytest.raises(SystemExit):
        run_cli(["smash", "-d", ".", "-o", "x"], tmp_path)


def test_smash_device_matrix_matches_host(tmp_path):
    """>64 sketches triggers the device matrix path; cells must match the
    host path at CSV precision."""
    import numpy as np

    from hulk_tpu.hashes.cws import build_cws_tables
    from hulk_tpu.io.sketchio import HULKData
    from hulk_tpu.sketch.histosketch import HistoSketch

    dims = 256
    tables = build_cws_tables(6, dims)
    rng = np.random.default_rng(0)
    for i in range(70):
        h = HistoSketch(11, 6, dims, 1.0, tables=tables)
        ids = np.sort(rng.choice(dims, 40, replace=False)).astype(np.int64)
        h.add_elements(ids, rng.integers(1, 9, 40).astype(np.float64))
        d = HULKData(filename=f"s{i}", banner="b")
        d.add(h)
        d.write_json(str(tmp_path / f"s{i:03d}.json"))
    run_cli(["smash", "-d", ".", "-k", "11", "-m", "weightedjaccard", "-o", "dev"], tmp_path)
    lines = (tmp_path / "dev.hulk-matrix.csv").read_text().splitlines()
    assert len(lines) == 71
    # spot-check against host computation
    from hulk_tpu.io.sketchio import load_hulk_data

    a = load_hulk_data(str(tmp_path / "s000.json"))
    b = load_hulk_data(str(tmp_path / "s001.json"))
    d_host = a.get_distance(b, "weightedjaccard", 11, "histosketch")
    cell = lines[1].split(",")[1]
    assert cell == f"{100 - d_host * 100:.2f}"
    diag = lines[1].split(",")[0]
    assert diag == "100.00"


def _mkfasta(path, n=300, length=150, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    with open(path, "wb") as fh:
        for i in range(n):
            seq = bytes(rng.choice(list(b"ACGT"), size=length).tolist())
            fh.write(b">contig%d desc\n" % i)
            # multi-line records exercise the accumulate path
            fh.write(seq[:70] + b"\n" + seq[70:] + b"\n")


def test_sketch_fasta_mode(tmp_path):
    _mkfasta(tmp_path / "x.fna")
    run_cli(["sketch", "-f", "x.fna", "--fasta", "-k", "11", "-o", "fa", "-p", "1"], tmp_path)
    import json

    d = json.loads((tmp_path / "fa.json").read_text())
    assert d["signatures"][0]["Sketch"]["ksize"] == 11
    # multi-line accumulate == single-line equivalent
    import numpy as np

    rng = np.random.default_rng(0)
    with open(tmp_path / "y.fna", "wb") as fh:
        for i in range(300):
            seq = bytes(rng.choice(list(b"ACGT"), size=150).tolist())
            fh.write(b">contig%d desc\n" % i + seq + b"\n")
    run_cli(["sketch", "-f", "y.fna", "--fasta", "-k", "11", "-o", "fb", "-p", "1"], tmp_path)
    a = json.loads((tmp_path / "fa.json").read_text())["signatures"][0]["Sketch"]
    b = json.loads((tmp_path / "fb.json").read_text())["signatures"][0]["Sketch"]
    assert a["mins"] == b["mins"] and a["weights"] == b["weights"]


def test_sketch_stdin(tmp_path):
    import gzip

    raw = gzip.open(FIXTURE, "rb").read()
    run_cli(["sketch", "-o", "stdin_out", "-p", "1"], tmp_path, stdin_bytes=raw)
    got = (tmp_path / "stdin_out.json").read_bytes()
    exp = open(os.path.join(GOLDEN, "fixture-default.json"), "rb").read()
    # identical except the filename field (STDIN vs path)
    import json

    g, e = json.loads(got), json.loads(exp)
    assert g["filename"] == "STDIN"
    assert g["signatures"] == e["signatures"]


def test_sketch_multi_file_comma(tmp_path):
    import gzip

    raw = gzip.open(FIXTURE, "rb").read().decode()
    lines = raw.splitlines()
    half = len(lines) // 2
    half -= half % 4
    (tmp_path / "a.fq").write_text("\n".join(lines[:half]) + "\n")
    (tmp_path / "b.fq").write_text("\n".join(lines[half:]) + "\n")
    run_cli(["sketch", "-f", "a.fq,b.fq", "-o", "two", "-p", "1"], tmp_path)
    run_cli(["sketch", "-f", "a.fq", "-f", "b.fq", "-o", "two2", "-p", "1"], tmp_path)
    import json

    g = json.loads((tmp_path / "two.json").read_text())
    g2 = json.loads((tmp_path / "two2.json").read_text())
    assert g["filename"] == "a.fq,b.fq,"
    assert g["signatures"] == g2["signatures"]
    e = json.loads(open(os.path.join(GOLDEN, "fixture-default.json")).read())
    assert g["signatures"] == e["signatures"]  # same reads, same sketch


def test_stream_interval_output(tmp_path, capsysbinary):
    """--stream with -i emits a HULKData JSON line per interval flush (the
    documented reference capability, cmd/sketch.go:56) plus the final one."""
    import json

    run_cli(
        ["sketch", "-f", FIXTURE, "-o", "st", "-p", "1", "-i", "250", "--stream"],
        tmp_path,
    )
    out = capsysbinary.readouterr().out
    # each emission is an indented JSON object + newline
    chunks = out.split(b'{\n    "class": "hulk_sketch"')[1:]
    assert len(chunks) == 5  # 4 intervals (1000/250) + final full output
    for ch in chunks:
        d = json.loads(b'{\n    "class": "hulk_sketch"' + ch)
        assert d["class"] == "hulk_sketch"
        assert d["signatures"][0]["Algorithm"] == "histosketch"
    # interval snapshots accumulate: the last interval snapshot equals the
    # final sketch (single final flush saw the same data)
    lastiv = json.loads(b'{\n    "class": "hulk_sketch"' + chunks[3])
    final = json.loads((tmp_path / "st.json").read_text())
    assert lastiv["signatures"][0]["Sketch"]["mins"] == final["signatures"][0]["Sketch"]["mins"]


def test_smash_device_jaccard_matches_host(tmp_path):
    """The >64-sketch device path with the plain jaccard metric (exact i32
    counting) must match the host per-pair path cell-for-cell."""
    import numpy as np

    from hulk_tpu.hashes.cws import build_cws_tables
    from hulk_tpu.io.sketchio import HULKData, load_hulk_data
    from hulk_tpu.sketch.histosketch import HistoSketch

    dims = 256
    tables = build_cws_tables(6, dims)
    rng = np.random.default_rng(5)
    for i in range(70):
        h = HistoSketch(11, 6, dims, 1.0, tables=tables)
        ids = np.sort(rng.choice(dims, 40, replace=False)).astype(np.int64)
        h.add_elements(ids, rng.integers(1, 9, 40).astype(np.float64))
        d = HULKData(filename=f"s{i}", banner="b")
        d.add(h)
        d.write_json(str(tmp_path / f"s{i:03d}.json"))
    run_cli(["smash", "-d", ".", "-k", "11", "-m", "jaccard", "-o", "dj"], tmp_path)
    lines = (tmp_path / "dj.hulk-matrix.csv").read_text().splitlines()
    assert len(lines) == 71
    a = load_hulk_data(str(tmp_path / "s002.json"))
    b = load_hulk_data(str(tmp_path / "s047.json"))
    d_host = a.get_distance(b, "jaccard", 11, "histosketch")
    assert lines[3].split(",")[47] == f"{100 - d_host * 100:.2f}"


def test_print_and_distance_subcommands(tmp_path, capsys):
    """v0.0.2 surface reconstructions: `hulk print` emits banner-matrix-style
    CSV rows (values + file path); `hulk distance` prints the pairwise
    distance the smash matrix would contain."""
    shutil.copy(os.path.join(GOLDEN, "part1.json"), tmp_path / "p1.json")
    shutil.copy(os.path.join(GOLDEN, "part2.json"), tmp_path / "p2.json")
    run_cli(["print", "-f", "p1.json", "-f", "p2.json"], tmp_path)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    assert out[0].endswith(",p1.json") and out[1].endswith(",p2.json")
    from hulk_tpu.io.sketchio import load_hulk_data

    a = load_hulk_data(str(tmp_path / "p1.json"))
    vals = [str(int(v)) for v in a.find_sketch(21, "histosketch").get_sketch()]
    assert out[0] == ",".join(vals) + ",p1.json"

    run_cli(["distance", "-f", "p1.json", "-f", "p2.json", "-m", "weightedjaccard"], tmp_path)
    got = float(capsys.readouterr().out.strip())
    b = load_hulk_data(str(tmp_path / "p2.json"))
    exp = a.get_distance(b, "weightedjaccard", 21, "histosketch")
    assert abs(got - exp) < 1e-6

    with pytest.raises(SystemExit):
        run_cli(["distance", "-f", "p1.json"], tmp_path)
