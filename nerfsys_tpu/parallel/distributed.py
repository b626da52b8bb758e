"""Multi-host initialization and cross-process reductions.

TPU-native counterpart of the reference's torch.distributed/NCCL usage
(/root/reference/scripts/create_clusters.py:224-238 env-driven
init_process_group; adaptive_nerf/utils.py:386-397 metric all_reduce).
NCCL calls become jax.distributed + XLA collectives: rank-strided work
splits key off jax.process_index(), and scalar reductions ride
multihost_utils (psum/pmin/pmax semantics over hosts).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Mirrors the reference's 'if RANK in os.environ' guard: with no
    coordinator configured this is a no-op and the program runs single-
    process (which IS the single-node test mode). Returns True if
    distributed mode is active.
    """
    import jax

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID", os.environ.get("RANK")
    )
    if coord is None or nproc is None or pid is None:
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_count() > 1


def process_info():
    import jax

    return jax.process_index(), jax.process_count()


def local_stride(n_items: int) -> np.ndarray:
    """This process's item indices, rank-strided like the reference's
    create_clusters image split (:799)."""
    rank, world = process_info()
    return np.arange(rank, n_items, world)


def all_reduce_host_scalars(
    values: Dict[str, float], op: str = "sum"
) -> Dict[str, float]:
    """Reduce host scalars across processes (SmoothedValue sync parity).

    op in {'sum', 'min', 'max'}. Single-process: identity.
    """
    import jax

    if jax.process_count() == 1:
        return dict(values)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = jnp.asarray([float(values[k]) for k in keys], jnp.float32)
    # process_allgather then reduce locally: works for any op, tiny payloads
    gathered = multihost_utils.process_allgather(arr)  # (P, n)
    red = {
        "sum": jnp.sum,
        "min": jnp.min,
        "max": jnp.max,
    }[op](gathered, axis=0)
    red = np.asarray(red)
    return {k: float(red[i]) for i, k in enumerate(keys)}


def broadcast_from_host0(tree):
    """Replicate host-0's pytree to all processes (checkpoint fan-out)."""
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
