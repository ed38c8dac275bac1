"""Backend-stall watchdog: detect a wedged device runtime, retry cleanly.

Remote-device PJRT runtimes (device tunnels) can wedge on the FIRST
host<->device data-path operation: backend registration and device
enumeration succeed, then a transfer readback blocks forever with every
client thread futex-parked at ~0 CPU (observed on the axon tunnel: the
client's network worker sits in epoll waiting for a reply that never
arrives; measured wedge rates from ~1/3 to every fresh connection during
bad windows). The reference has no equivalent failure mode — it is a
single local process (SURVEY §5 failure policy is plain fail-fast) — so
this is a new-capability guard, not parity.

A wedged call cannot be cancelled from Python (it blocks inside native
code), and the stuck state is per-connection: a FRESH PROCESS gets a fresh
tunnel connection and, empirically, usually succeeds. So the watchdog:

1. probes the data path (tiny device_put + readback echo — exactly the op
   class that wedges, with no compile-time variance) in a daemon thread
   with a deadline;
2. on timeout, logs a diagnostic and re-executes the process in place
   (``os.execv`` — fresh connection, same argv) up to ``max_attempts``
   times, tracked across execs via ``HULK_WEDGE_ATTEMPT``;
3. if attempts are exhausted, aborts with a clear error instead of
   hanging forever.

Tunables: ``HULK_INIT_TIMEOUT`` seconds (default 75; ``0`` disables the
watchdog entirely), ``HULK_INIT_RETRIES`` total attempts (default 3).

Re-exec is refused (abort instead) when the run cannot be transparently
restarted: multi-process runs (``jax.distributed`` peers would deadlock
waiting for this rank) and STDIN input (the consumed stream cannot be
replayed).
"""
from __future__ import annotations

import logging
import os
import sys
import threading
import time

log = logging.getLogger("hulk")

ENV_TIMEOUT = "HULK_INIT_TIMEOUT"
ENV_RETRIES = "HULK_INIT_RETRIES"
ENV_ATTEMPT = "HULK_WEDGE_ATTEMPT"  # internal: attempt index across execs
DEFAULT_TIMEOUT_S = 75.0
DEFAULT_RETRIES = 3


class BackendStallError(RuntimeError):
    """The device backend failed to answer the data-path probe in time."""


_abandoned_probe = False


def unsafe_teardown() -> bool:
    """True when a real probe thread was abandoned mid-native-call: normal
    interpreter teardown then aborts (the runtime's C++ unwinds across the
    parked thread — observed 'FATAL: exception not rethrown' SIGABRT).
    Callers that are about to exit should use os._exit instead."""
    return _abandoned_probe


def probe_device_roundtrip(timeout_s: float, _op=None) -> tuple[bool, float]:
    """Run one tiny host->device->host round trip under a deadline.

    Returns (completed_in_time, elapsed_s). The probe runs in a daemon
    thread because a wedged native call cannot be interrupted; on timeout
    the thread is abandoned (it dies with the process, which is the
    point — the caller re-execs or aborts). Exceptions from a COMPLETED
    probe re-raise in the caller (a real error beats a fake timeout).
    """
    done = threading.Event()
    err: list[BaseException] = []

    def work():
        try:
            if _op is not None:
                _op()
            else:
                import numpy as np

                import jax

                # echo readback (no jit): the exact op class observed to
                # wedge, with no compile-cache variance in its latency
                x = jax.device_put(np.arange(16, dtype=np.int32))
                np.asarray(x)
        except BaseException as e:  # noqa: BLE001 — reported to caller
            err.append(e)
        finally:
            done.set()

    t0 = time.monotonic()
    threading.Thread(target=work, daemon=True, name="hulk-init-probe").start()
    ok = done.wait(timeout_s)
    dt = time.monotonic() - t0
    if ok and err:
        raise err[0]
    if not ok and _op is None:
        global _abandoned_probe
        _abandoned_probe = True
    return ok, dt


def _current_attempt() -> int:
    try:
        return int(os.environ.get(ENV_ATTEMPT, "0"))
    except ValueError:
        return 0


def ensure_backend_alive(
    *,
    allow_reexec: bool = True,
    timeout_s: float | None = None,
    max_attempts: int | None = None,
    _probe=None,
    _reexec=None,
) -> None:
    """Probe the device data path; re-exec or abort on a stall.

    Call once, early — after CLI parsing but BEFORE consuming any
    un-replayable input. No-ops on the cpu backend (nothing to wedge) and
    when ``HULK_INIT_TIMEOUT=0``.
    """
    if timeout_s is None:
        try:
            timeout_s = float(os.environ.get(ENV_TIMEOUT, DEFAULT_TIMEOUT_S))
        except ValueError:
            timeout_s = DEFAULT_TIMEOUT_S
    if timeout_s <= 0:
        return
    if max_attempts is None:
        try:
            max_attempts = int(os.environ.get(ENV_RETRIES, DEFAULT_RETRIES))
        except ValueError:
            max_attempts = DEFAULT_RETRIES

    import jax

    if _probe is None and jax.default_backend() == "cpu":
        return

    attempt = _current_attempt()
    probe = _probe or probe_device_roundtrip
    ok, dt = probe(timeout_s)
    if ok:
        if attempt:
            log.info(
                "\tdevice backend recovered on attempt %d (probe %.2fs)",
                attempt + 1, dt,
            )
        return

    diag = (
        f"device backend stalled: no response to a data-path probe in "
        f"{timeout_s:.0f}s (backend={jax.default_backend()}; init and device "
        f"enumeration succeeded, so the transfer/execute path is wedged — "
        f"with a remote-device tunnel this is a lost connection, not a slow "
        f"compile)"
    )
    if allow_reexec and attempt + 1 < max_attempts:
        print(
            f"# hulk: {diag}; retrying with a fresh process "
            f"(attempt {attempt + 2}/{max_attempts})",
            file=sys.stderr, flush=True,
        )
        os.environ[ENV_ATTEMPT] = str(attempt + 1)
        reexec = _reexec or _default_reexec
        reexec()
        return  # only reachable with an injected _reexec (tests)
    raise BackendStallError(
        f"{diag}; giving up after {attempt + 1} attempt(s). Set "
        f"{ENV_TIMEOUT}=0 to disable this watchdog or {ENV_RETRIES} to "
        f"allow more retries."
    )


def guard_backend(logger, *, allow_reexec: bool) -> None:
    """CLI-facing wrapper around ensure_backend_alive: on a stall with no
    retries left, log the reference-style fatal and exit — via os._exit
    when an abandoned native probe thread makes interpreter teardown abort
    (SIGABRT), SystemExit(1) otherwise."""
    try:
        ensure_backend_alive(allow_reexec=allow_reexec)
    except BackendStallError as e:
        logger.error("ERROR---> %s", e)
        if unsafe_teardown():
            os._exit(1)
        raise SystemExit(1) from None


def _default_reexec() -> None:
    """Replace this process with a fresh run of the same command line.

    A fresh process gets a fresh tunnel connection; the wedged probe
    thread (parked in native code) dies with the old image.
    """
    sys.stdout.flush()
    sys.stderr.flush()
    argv0 = sys.argv[0]
    if os.path.exists(argv0) and os.access(argv0, os.X_OK):
        os.execv(argv0, sys.argv)
    os.execv(sys.executable, [sys.executable] + sys.argv)
