"""Backend-stall watchdog (stream/watchdog.py).

The wedge being guarded against: a remote-device tunnel client that stops
answering data-path requests with every thread parked (observed on real
hardware; see the module docstring). Tests simulate the stall by injecting
a probe/op that never completes and assert the watchdog's three outcomes:
pass-through, re-exec request, and a clean abort — never a hang.
"""
import os
import threading
import time

import pytest

from hulk_tpu.stream import watchdog as wd


def _stalled_probe(timeout_s):
    """A probe that 'times out' immediately (simulated wedge)."""
    return False, timeout_s


def _ok_probe(timeout_s):
    return True, 0.01


def test_probe_completes_fast_op():
    ok, dt = wd.probe_device_roundtrip(30.0, _op=lambda: None)
    assert ok and dt < 5.0


def test_probe_times_out_on_stalled_op():
    hang = threading.Event()
    t0 = time.monotonic()
    ok, dt = wd.probe_device_roundtrip(0.2, _op=hang.wait)
    assert not ok
    assert 0.15 <= time.monotonic() - t0 < 5.0
    hang.set()  # release the abandoned daemon thread


def test_probe_propagates_real_errors():
    def boom():
        raise RuntimeError("device says no")

    with pytest.raises(RuntimeError, match="device says no"):
        wd.probe_device_roundtrip(5.0, _op=boom)


def test_ensure_noop_when_disabled(monkeypatch):
    monkeypatch.setenv(wd.ENV_TIMEOUT, "0")
    # a stalled probe is never consulted when the watchdog is off
    wd.ensure_backend_alive(_probe=_stalled_probe)


def test_ensure_passes_on_healthy_backend(monkeypatch):
    monkeypatch.delenv(wd.ENV_ATTEMPT, raising=False)
    wd.ensure_backend_alive(_probe=_ok_probe)


def test_ensure_reexecs_on_stall(monkeypatch):
    monkeypatch.delenv(wd.ENV_ATTEMPT, raising=False)
    monkeypatch.setenv(wd.ENV_TIMEOUT, "1")
    calls = []
    wd.ensure_backend_alive(
        _probe=_stalled_probe, _reexec=lambda: calls.append(True)
    )
    assert calls == [True]
    # the attempt counter crossed into the env for the fresh process
    assert os.environ[wd.ENV_ATTEMPT] == "1"


def test_ensure_aborts_after_max_attempts(monkeypatch):
    monkeypatch.setenv(wd.ENV_TIMEOUT, "1")
    monkeypatch.setenv(wd.ENV_ATTEMPT, "2")  # two re-execs already happened
    monkeypatch.setenv(wd.ENV_RETRIES, "3")
    with pytest.raises(wd.BackendStallError, match="stalled"):
        wd.ensure_backend_alive(
            _probe=_stalled_probe, _reexec=lambda: pytest.fail("must not re-exec")
        )


def test_ensure_aborts_when_reexec_disallowed(monkeypatch):
    monkeypatch.delenv(wd.ENV_ATTEMPT, raising=False)
    monkeypatch.setenv(wd.ENV_TIMEOUT, "1")
    with pytest.raises(wd.BackendStallError):
        wd.ensure_backend_alive(
            allow_reexec=False,
            _probe=_stalled_probe,
            _reexec=lambda: pytest.fail("must not re-exec"),
        )


def test_cli_sketch_aborts_cleanly_on_simulated_stall(monkeypatch, tmp_path, capsys):
    """End-to-end: a stalled backend fails `hulk sketch` with the reference
    fatal policy (ERROR---> + exit 1) instead of hanging."""
    import jax

    from hulk_tpu import cli

    monkeypatch.setenv(wd.ENV_TIMEOUT, "1")
    monkeypatch.setenv(wd.ENV_RETRIES, "1")
    monkeypatch.delenv(wd.ENV_ATTEMPT, raising=False)
    # the watchdog skips the cpu backend; pretend we are on a device runtime
    # with a wedged data path
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(wd, "probe_device_roundtrip", _stalled_probe)
    fixture = "/root/reference/testing/test-reads-small.fq.gz"
    assert os.path.exists(fixture)  # else this test exits 1 for the wrong reason
    out = str(tmp_path / "wd")
    with pytest.raises(SystemExit) as ei:
        cli.main(["sketch", "-f", fixture, "-o", out])
    assert ei.value.code == 1
    assert not os.path.exists(out + ".json")
    err = capsys.readouterr()
    assert "stalled" in err.err or "stalled" in err.out
