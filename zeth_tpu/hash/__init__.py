"""Hash layer: batched Poseidon2 / SHA-256 / Keccak-f[1600] + Merkle trees.

Replaces the hash suites of risc0-zkp 3.0.2 (SURVEY.md §2.2: Poseidon2
over Baby Bear — width 24, 8 full + 21 partial rounds, 8-element digests;
SHA-256; and the Keccak-f[1600] accelerator of risc0-circuit-keccak).

TPU-native design: every permutation is batched with the batch riding the
128-wide lane axis ("cells-first" layout — state shape ``(cells, batch)``),
so thousands of hashes run as one fused elementwise program on the VPU.
"""

from .poseidon2 import (  # noqa: F401
    CELLS,
    CAPACITY,
    RATE,
    DIGEST_LEN,
    permute,
    permute_np,
    hash_rows,
    hash_pairs,
    hash_rows_np,
    hash_pairs_np,
)
