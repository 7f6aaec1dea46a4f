"""Multi-host runtime: jax.distributed bring-up + pod meshes + block fan-out.

The reference scales across machines with OS processes and a remote
proving service (SURVEY.md §2.3: GNU parallel fan-out, the r0vm process
boundary, the Bonsai client). The TPU-native equivalent is a single JAX
distributed runtime: every host calls `init()` (coordinator address from
env or args), builds the global mesh over all pod chips, and proves with
`zkp.prover.prove(..., mesh=...)` — XLA routes intra-proof collectives
over ICI within a slice and DCN across slices.

Two usage layers:

- **intra-proof**: `pod_mesh()` returns a ("rows",) mesh over every chip
  in the pod; pass it to `prover.prove`. One proof, all chips.
- **inter-proof (the run-parallel axis)**: `shard_work(items)` splits a
  work list (segments, blocks) across hosts by process index; each host
  proves its share on its local chips (`local_mesh()`), and the
  join-tree scheduler (zeth_tpu.recursion) merges the receipts. A lost
  host's share is simply re-dispatched — per-segment proofs are
  idempotent (SURVEY.md §5 failure-detection note).

Single-host processes (no coordinator configured) degrade gracefully:
`init()` is a no-op and both meshes cover the local chips only.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def init(coordinator: str | None = None, num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Bring up jax.distributed from args or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env. No-op when unconfigured."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=(num_processes
                       if num_processes is not None
                       else int(os.environ.get("JAX_NUM_PROCESSES", "1"))),
        process_id=(process_id
                    if process_id is not None
                    else int(os.environ.get("JAX_PROCESS_ID", "0"))),
    )


def pod_mesh(axis: str = "rows") -> Mesh:
    """One mesh over every chip in the (multi-host) pod."""
    return Mesh(np.array(jax.devices()), (axis,))


def local_mesh(axis: str = "rows") -> Mesh:
    """Mesh over this host's chips only (inter-proof parallelism)."""
    return Mesh(np.array(jax.local_devices()), (axis,))


def shard_work(items: list) -> list:
    """This host's share of a work list (round-robin by process index)."""
    pid = jax.process_index()
    n = jax.process_count()
    return [it for i, it in enumerate(items) if i % n == pid]
