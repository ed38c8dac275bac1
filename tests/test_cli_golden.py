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
