"""Mesh/sharding layer: multi-chip NTT, sharded commits, pod scaling.

Maps the reference's intra-proof data parallelism (SURVEY.md §2.3:
NTT butterflies / Merkle layers / constraint eval over trace rows,
CPU-threaded or Metal/CUDA in risc0-zkp) onto a JAX device mesh:
trace rows ride a ``rows`` mesh axis; the NTT is the Bailey four-step
with ``all_to_all`` stage exchange over ICI; Merkle subtree roots merge
with an ``all_gather``.
"""

from .dist_ntt import dist_ntt, dist_intt, dist_coset_lde  # noqa: F401
from .commit import sharded_commit_root  # noqa: F401
from .multihost import init as init_distributed, local_mesh, pod_mesh, \
    shard_work  # noqa: F401
