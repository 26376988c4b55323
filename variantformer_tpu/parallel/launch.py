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


def globalize_train_state(state, mesh):
    """Identical per-process TrainState -> replicated global arrays on a
    multi-host mesh. Every process must hold the same values (same init key
    or the same restored checkpoint); DP gradient sync then keeps them in
    lockstep. For models too large to replicate, restore pre-sharded instead
    (models/checkpoint.load_checkpoint(mesh=...))."""
    import numpy as np
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    from variantformer_tpu.train.steps import TrainState

    rep = lambda x: mhu.host_local_array_to_global_array(np.asarray(x), mesh, P())
    return TrainState(
        jax.tree.map(rep, state.params),
        jax.tree.map(rep, state.opt_state),
        rep(state.step),
    )


def globalize_step_args(args: tuple, mesh) -> tuple:
    """Per-process local step args -> one global batch on a multi-host mesh.

    Each process contributes its OWN donors: Seq2GeneBatch fields and bare
    leading-dim arrays concatenate across processes along "data"
    (``host_local_array_to_global_array``); ``tissue_ids`` and python
    scalars replicate (must be identical on every host). The multi-host
    counterpart of ``parallel.mesh.shard_step_args``."""
    import numpy as np
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    from variantformer_tpu.models.seq2gene import Seq2GeneBatch
    from variantformer_tpu.parallel.mesh import batch_specs

    def glob(x, spec):
        return mhu.host_local_array_to_global_array(np.asarray(x), mesh, spec)

    out = []
    for a in args:
        if isinstance(a, Seq2GeneBatch):
            specs = batch_specs(a)
            out.append(Seq2GeneBatch(**{
                n: (None if getattr(a, n) is None
                    else glob(getattr(a, n), getattr(specs, n)))
                for n in a._fields
            }))
        elif getattr(a, "ndim", 0) >= 1:
            out.append(glob(a, P("data", *([None] * (a.ndim - 1)))))
        else:
            out.append(a)
    return tuple(out)
