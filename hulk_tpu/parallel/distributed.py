"""Multi-host initialisation.

The reference has no distributed mode (single Go process; SURVEY.md §2.3).
Here multi-host runs use jax.distributed with a global mesh: every host
feeds its own shard of the read stream, histograms merge with psum over ICI/
DCN, and flushes are replicated (identical inputs -> identical outputs, no
cross-host synchronisation beyond the psum).

Environment (standard JAX conventions):
  HULK_COORDINATOR  host:port of process 0 (or JAX_COORDINATOR_ADDRESS)
  HULK_NUM_PROCS    total process count   (or JAX_NUM_PROCESSES)
  HULK_PROC_ID      this process's id     (or JAX_PROCESS_ID)
"""
from __future__ import annotations

import os


def init_distributed() -> bool:
    """Initialise jax.distributed from env; returns True if multi-host."""
    coord = os.environ.get("HULK_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coord:
        return False
    nprocs = int(
        os.environ.get("HULK_NUM_PROCS") or os.environ.get("JAX_NUM_PROCESSES") or 1
    )
    pid = int(os.environ.get("HULK_PROC_ID") or os.environ.get("JAX_PROCESS_ID") or 0)
    if nprocs <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    return True


def allgather(x) -> "np.ndarray":
    """Gather a host array from every process -> [nprocs, ...] on all hosts.
    All processes must pass the same shape/dtype."""
    import numpy as np
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def allreduce_sum(x) -> "np.ndarray":
    """Exact cross-process sum of a host array (integer-valued f64 histogram
    counts and scalar counters sum exactly)."""
    return allgather(x).sum(axis=0)


def process_read_shard(paths: list[str]) -> list[str]:
    """Static file-level sharding of the input across processes: process i
    takes files i, i+N, i+2N... (deterministic; global read order within a
    file stays intact so interval flush boundaries remain well-defined
    per-shard; use interval=0 or per-file intervals in multi-host mode)."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    return paths[i::n]
