"""Multi-host launch helpers.

The reference has no distributed launcher (inference is pinned to one GPU,
SURVEY.md §2.3); here multi-host TPU slices initialize through
``jax.distributed`` and reuse the same named shardings — data parallelism
lands across hosts (DCN), tensor parallelism inside each host (ICI).
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize multi-host JAX. On TPU pods the arguments are discovered
    from the environment; pass them explicitly elsewhere. Idempotent."""
    already = getattr(jax.distributed, "is_initialized", lambda: False)
    try:
        if not already():
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError) as exc:
        log.info("jax.distributed not initialized (%s); single-process mode", exc)
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    log.info("distributed topology: %s", info)
    return info


def shard_query_across_hosts(items: list, process_index: int | None = None,
                             process_count: int | None = None) -> list:
    """Round-robin split of a work list (genes, variants) across hosts —
    the DCN-level data parallelism for genome-wide sweeps."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return items[pi::pc]
