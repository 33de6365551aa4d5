"""Multi-host (multi-process) bootstrap over ``jax.distributed``.

The reference distributes SPIRAL with PyTorch-Lightning DDP driven by env
variables — MASTER_ADDR / MASTER_PORT / WORLD_SIZE / NODE_RANK
(SPIRAL/README.md:36-42) — with NCCL underneath. The TPU-native equivalent is
``jax.distributed.initialize`` federating all processes into one global device
view; a single ``jax.sharding.Mesh`` over the global devices then expresses
data parallelism, with gradient all-reduce riding ICI within a slice and DCN
across slices (XLA inserts the collectives from the sharding annotations).

Env surface kept compatible with the reference launch commands:
  MASTER_ADDR / MASTER_PORT  -> coordinator address
  WORLD_SIZE                 -> number of processes (nodes)
  NODE_RANK                  -> this process's id
On real TPU pods none of these are needed: ``jax.distributed.initialize()``
auto-detects the slice topology from the TPU metadata.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def is_initialized() -> bool:
    return _initialized


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` with env fallbacks.

    Explicit args win; otherwise MASTER_ADDR/MASTER_PORT + WORLD_SIZE +
    NODE_RANK (the reference's DDP env surface) are consulted; with neither,
    defer entirely to JAX's own auto-detection (TPU pod metadata).
    """
    global _initialized
    if _initialized:
        return

    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        port = os.environ.get("MASTER_PORT", "12355")
        coordinator_address = f"{os.environ['MASTER_ADDR']}:{port}"
    if num_processes is None and os.environ.get("WORLD_SIZE"):
        num_processes = int(os.environ["WORLD_SIZE"])
    if process_id is None and os.environ.get("NODE_RANK"):
        process_id = int(os.environ["NODE_RANK"])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint side effects."""
    return jax.process_index() == 0


def allreduce_sum(x) -> "np.ndarray":
    """Element-wise sum of a small host array across processes (identity in
    a single-process run). Used for exact global metric reduction (error
    counts) after per-process eval shards — the reference's
    dist_sync_on_step WER reduction analog (ctc_finetune.py:119)."""
    import numpy as np

    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x)).sum(axis=0)


def require_multiprocess(num_nodes: int) -> None:
    """Fail loudly if a multi-node launch wasn't actually federated
    (replaces the reference's silent PL fallback; a --num_nodes flag that
    no-ops is worse than absent)."""
    if num_nodes > 1 and jax.process_count() < num_nodes:
        raise RuntimeError(
            f"--num_nodes={num_nodes} but only {jax.process_count()} "
            "JAX process(es) federated. Set MASTER_ADDR/MASTER_PORT/"
            "WORLD_SIZE/NODE_RANK (or run on a TPU pod slice) so "
            "jax.distributed.initialize can connect the hosts."
        )
