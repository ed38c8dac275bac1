"""True multi-process test: two OS processes under jax.distributed, each
sketching its file shard of the fixture; the merged output written by
process 0 must be bit-identical to a single-process run over both files.
"""
import gzip
import json
import os
import socket
import subprocess
import sys

import pytest

FIXTURE = "/root/reference/testing/test-reads-small.fq.gz"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not mounted"
)


def _env(**extra):
    """Subprocess env: the repo is not pip-installed, so the package must be
    importable from any cwd via PYTHONPATH."""
    env = dict(os.environ, **extra)
    env["PYTHONPATH"] = REPO_ROOT + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    return env


def _split_fixture(tmp_path):
    lines = gzip.open(FIXTURE, "rb").read().splitlines(keepends=True)
    half = (len(lines) // 2) // 4 * 4
    (tmp_path / "a.fq").write_bytes(b"".join(lines[:half]))
    (tmp_path / "b.fq").write_bytes(b"".join(lines[half:]))
    return str(tmp_path / "a.fq"), str(tmp_path / "b.fq")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sketch_matches_single(tmp_path):
    fa, fb = _split_fixture(tmp_path)
    out_multi = str(tmp_path / "multi")
    port = _free_port()

    procs = []
    for pid in range(2):
        env = _env(
            HULK_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
            HULK_COORDINATOR=f"127.0.0.1:{port}",
            HULK_NUM_PROCS="2",
            HULK_PROC_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "hulk_tpu.cli", "sketch",
                    "-f", fa, "-f", fb, "-k", "11", "-s", "8",
                    "-o", out_multi, "-p", "1",
                    "--kmv", "--khf", "--hmh",  # exercise the secondary merges
                ],
                env=env, cwd=tmp_path,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    # single-process reference over the same two files
    env = _env(HULK_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out_single = str(tmp_path / "single")
    r = subprocess.run(
        [
            sys.executable, "-m", "hulk_tpu.cli", "sketch",
            "-f", fa, "-f", fb, "-k", "11", "-s", "8",
            "-o", out_single, "-p", "1",
            "--kmv", "--khf", "--hmh",
        ],
        env=env, cwd=tmp_path, capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")[-2000:]

    multi = json.load(open(out_multi + ".json"))
    single = json.load(open(out_single + ".json"))
    assert multi["signatures"] == single["signatures"]
    assert multi["filename"] == single["filename"]


def test_more_processes_than_files(tmp_path):
    """A process whose file shard is empty must still participate in the
    collective merge and must NOT read STDIN (VERDICT r2 item 4)."""
    fa, fb = _split_fixture(tmp_path)
    out_multi = str(tmp_path / "multi3")
    port = _free_port()

    procs = []
    for pid in range(3):
        env = _env(
            HULK_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
            HULK_COORDINATOR=f"127.0.0.1:{port}",
            HULK_NUM_PROCS="3",
            HULK_PROC_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "hulk_tpu.cli", "sketch",
                    "-f", fa, "-f", fb, "-k", "11", "-s", "8",
                    "-o", out_multi, "-p", "1",
                ],
                env=env, cwd=tmp_path,
                stdin=subprocess.DEVNULL,  # a stdin read would fail fast
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    env = _env(HULK_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out_single = str(tmp_path / "single3")
    r = subprocess.run(
        [
            sys.executable, "-m", "hulk_tpu.cli", "sketch",
            "-f", fa, "-f", fb, "-k", "11", "-s", "8",
            "-o", out_single, "-p", "1",
        ],
        env=env, cwd=tmp_path, capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")[-2000:]
    multi = json.load(open(out_multi + ".json"))
    single = json.load(open(out_single + ".json"))
    assert multi["signatures"] == single["signatures"]


def test_two_process_smash_matches_single(tmp_path):
    """Distributed smash (sharded JSON loads -> allgathered mins/weights ->
    per-process row stripes -> gathered matrix, process 0 writes) must
    produce a byte-identical CSV to the single-process host run."""
    # build 5 small sketches through the CLI
    lines = gzip.open(FIXTURE, "rb").read().splitlines(keepends=True)
    env = _env(HULK_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    sketch_dir = tmp_path / "sketches"
    sketch_dir.mkdir()
    for i in range(5):
        part = b"".join(lines[i * 400 : (i + 1) * 400])  # 100 reads each
        fq = tmp_path / f"part{i}.fq"
        fq.write_bytes(part)
        r = subprocess.run(
            [
                sys.executable, "-m", "hulk_tpu.cli", "sketch",
                "-f", str(fq), "-k", "11", "-s", "8",
                "-o", str(sketch_dir / f"s{i}"), "-p", "1",
            ],
            env=env, cwd=tmp_path, capture_output=True,
        )
        assert r.returncode == 0, r.stderr.decode(errors="replace")[-2000:]

    # single-process reference CSV (host scalar path: N <= 64)
    r = subprocess.run(
        [
            sys.executable, "-m", "hulk_tpu.cli", "smash",
            "-d", str(sketch_dir) + "/", "-m", "weightedjaccard",
            "-o", str(tmp_path / "single"), "-k", "11",
        ],
        env=env, cwd=tmp_path, capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")[-2000:]

    port = _free_port()
    procs = []
    for pid in range(2):
        penv = _env(
            HULK_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
            HULK_COORDINATOR=f"127.0.0.1:{port}",
            HULK_NUM_PROCS="2",
            HULK_PROC_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "hulk_tpu.cli", "smash",
                    "-d", str(sketch_dir) + "/", "-m", "weightedjaccard",
                    "-o", str(tmp_path / "multi"), "-k", "11",
                ],
                env=penv, cwd=tmp_path,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    single_csv = (tmp_path / "single.hulk-matrix.csv").read_bytes()
    multi_csv = (tmp_path / "multi.hulk-matrix.csv").read_bytes()
    assert multi_csv == single_csv
