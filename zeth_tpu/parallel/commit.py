"""Sharded Merkle commitment: local subtrees + all_gather of shard roots.

Maps risc0-zkp's threaded Merkle layers (SURVEY.md §2.2) onto the mesh:
each device hashes its contiguous block of LDE rows into a subtree root
(pure local Poseidon2 batch work), the D subtree roots are all_gathered,
and every device folds them into the global root. For power-of-two D the
result equals the single-device ``merkle.commit_rows`` root.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS

from ..hash import poseidon2 as P2

_U32 = jnp.uint32


def _local_subtree_root(rows):
    digests = P2.hash_rows(rows)
    while digests.shape[0] > 1:
        digests = P2.hash_pairs(digests[0::2], digests[1::2])
    return digests  # (1, 8)


def sharded_commit_root(matrix, mesh: Mesh, axis: str = "rows"):
    """Global Merkle root of a row-block-sharded (n, cols) matrix.

    Returns a replicated (8,) Montgomery digest array.
    """

    def local(rows):
        sub = _local_subtree_root(rows)                    # (1, 8)
        roots = jax.lax.all_gather(sub[0], axis)           # (D, 8)
        while roots.shape[0] > 1:
            roots = P2.hash_pairs(roots[0::2], roots[1::2])
        return roots[0]

    fn = jax.shard_map(local, mesh=mesh, in_specs=PS(axis),
                       out_specs=PS(), check_vma=False)
    return fn(matrix)
