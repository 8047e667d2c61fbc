"""Multi-host (multi-process) readiness hooks.

A TPU pod slice runs one process per host; JAX needs
``jax.distributed.initialize()`` before first backend use so every process
sees the global device set, and host data must be assembled into global
arrays with ``jax.make_array_from_process_local_data``. The reference has no
distributed anything (reference trainer.py:9 TODO); this is new scope per
SURVEY.md §5.8.

Environment contract (set by the launcher on every host):
  JAX_COORDINATOR    host:port of process 0 (presence enables initialize)
  JAX_NUM_PROCESSES  total process count
  JAX_PROCESS_ID     this process's index

Data contract: ``batch_size`` everywhere in this framework is the GLOBAL
batch; each process feeds its own ``batch_size // process_count`` examples
per step (the Trainer's loader yields process-local batches) and
``Trainer._shard_batch`` assembles them into one P('data')-sharded global
array. XLA then emits gradient all-reduces over ICI within a slice and DCN
across slices — no NCCL/MPI-style process groups anywhere.
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_initialize_distributed", "process_local_batch_size"]

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Call jax.distributed.initialize() from JAX_COORDINATOR/_NUM_PROCESSES/
    _PROCESS_ID if set. Must run before first device use. Returns whether
    initialization happened (idempotent; False on single-host runs)."""
    global _initialized
    coordinator = os.environ.get("JAX_COORDINATOR")
    if not coordinator or _initialized:
        return False
    kwargs = dict(coordinator_address=coordinator)
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_local_batch_size(global_batch_size: int) -> int:
    """Per-host share of a global batch (documented data contract above)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} must divide process count {n}"
    )
    return global_batch_size // n
