"""Merkle commitment trees over trace matrices (device build, host verify).

Replaces the Merkle tree machinery of risc0-zkp 3.0.2 (SURVEY.md §2.2:
Merkle commit trees over witness-column LDEs; FRI query openings). The
reference commits a (rows x cols) evaluation matrix by hashing each row
to a digest and reducing pairs layer by layer.

TPU-native design: the leaf hash is one batched Poseidon2 sponge over all
rows at once; every tree layer is one batched digest-pair permutation —
log2(n) kernel launches total, all data device-resident. Queried-path
opening and verification run on the host (they touch ~50 rows).

Row indexing: leaves are committed in natural row order. Layer k holds
2^k digests; root is layer 0. Node i's children are 2i, 2i+1.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .. import field as F
from . import poseidon2 as P2

_U32 = jnp.uint32


@dataclass
class MerkleTree:
    """Device-resident tree. layers[0] = root (1, 8) ... layers[-1] = leaves."""
    layers: list          # list of (2^k, 8) device arrays, Montgomery
    n_leaves: int
    _root: np.ndarray = None

    @property
    def root(self) -> np.ndarray:
        """Root digest in standard form (host numpy, shape (8,))."""
        if self._root is None:
            lay0 = self.layers[0]
            if isinstance(lay0, np.ndarray):        # host-finished level
                rinv = pow(1 << 32, P2.P - 2, P2.P)
                self._root = (lay0[0].astype(np.uint64)
                              * np.uint64(rinv) % np.uint64(P2.P))
            else:
                self._root = np.asarray(
                    F.from_monty(lay0))[0].astype(np.uint64)
        return self._root

    def open(self, idx: int) -> np.ndarray:
        """Sibling path for leaf idx: (depth, 8) digests, standard form."""
        return self.open_many([idx])[0]

    def open_many(self, indices: list) -> list:
        """Sibling paths for many leaves in ONE device dispatch (gathers
        only the needed digests — whole layers can be GBs)."""
        depth = len(self.layers) - 1
        if depth == 0:
            return [np.zeros((0, 8), dtype=np.uint64) for _ in indices]
        idx_rows = []
        idxs = list(indices)
        for _ in range(depth):
            idx_rows.append([i ^ 1 for i in idxs])
            idxs = [i >> 1 for i in idxs]
        sibs = _gather_paths(self.layers,
                             jnp.asarray(np.array(idx_rows, np.int32)))
        sib_per_layer = [np.asarray(s).astype(np.uint64) for s in sibs]
        return [np.stack([sib_per_layer[d][qi] for d in range(depth)])
                for qi in range(len(indices))]


@jax.jit
def _gather_paths(layers, idx_mat):
    """Gather sibling digests from every layer in one program.

    idx_mat: (depth, n_queries) int32, bottom-up (row d indexes the d-th
    layer above the leaves). Returns standard-form (n_queries, 8) arrays.
    """
    outs = []
    for d, layer in enumerate(reversed(layers[1:])):
        outs.append(F.from_monty(layer[idx_mat[d]]))
    return outs


def commit_rows(matrix) -> MerkleTree:
    """Commit a (rows, cols) Montgomery matrix. rows must be a power of two.

    Two jits: the leaf hash (compiled per column width — a small sponge
    scan) and the pair-tree reduction (compiled once per row count and
    SHARED by every group/width). Keeping the tree build width-independent
    matters: XLA compile time per program is the prover's dominant fixed
    cost on the axon TPU path (round-1's single fused build recompiled the
    whole tree for each of the 4 group widths).
    """
    n = matrix.shape[0]
    assert n & (n - 1) == 0, "row count must be a power of two"
    leaves = leaf_digests(matrix)
    return MerkleTree(layers=_build_layers_from_digests(leaves), n_leaves=n)


def leaf_digests(matrix):
    """Batched leaf hash of a (rows, cols) Montgomery matrix: the Pallas
    fused-sponge kernel on a real chip, the XLA absorb scan elsewhere
    (bit-identical; tests/test_pallas.py)."""
    from .. import pallas as PK
    if matrix.shape[1] and PK.enabled(matrix):
        from ..pallas import poseidon2 as PP
        if PP.supported(matrix.shape):
            return PP.hash_rows(matrix)
    if matrix.size > P2.STREAM_HASH_ELEMS:
        return P2.hash_rows_large(matrix)
    return P2.hash_rows(matrix)


# Below this many digests the remaining levels move to the host: one
# ≤32 KB transfer replaces ~10 round-trip dispatches per tree (the
# tunneled chip's dispatch latency dominates tiny batches), and the
# host's vectorized numpy permutation covers 1024 lanes in ~1 ms.
HOST_LEVELS_AT = 1024


def _build_layers_from_digests(digests):
    """One dispatch per device tree level; small levels finish on host.

    A single whole-tree jit re-traces ~20 unrolled permutations into one
    program: ~8 minutes of XLA compile at 2^20 leaves on the axon path
    (and a separate compile per leaf count). Per-level dispatches compile
    one small one-permutation program per level *shape*, shared by every
    group and AIR. Host layers are numpy uint32 Montgomery arrays —
    interchangeable with device layers everywhere they are indexed."""
    layers = [digests]
    cur = digests
    while cur.shape[0] > HOST_LEVELS_AT:
        cur = _hash_level(cur)
        layers.append(cur)
    if cur.shape[0] > 1:
        host = _host_levels(np.asarray(jax.device_get(cur)))
        layers.extend(host)
    layers.reverse()
    return layers


def _host_levels(cur_m: np.ndarray) -> list:
    """Finish a tree on host. cur_m: (m, 8) uint32 Montgomery numpy.
    Returns the remaining levels (m/2, ..., 1) as Montgomery numpy."""
    rinv = pow(1 << 32, P2.P - 2, P2.P)
    std = cur_m.astype(np.uint64) * np.uint64(rinv) % np.uint64(P2.P)
    out = []
    while std.shape[0] > 1:
        std = P2.hash_pairs_np(std[0::2], std[1::2])
        out.append(((std << np.uint64(32)) % np.uint64(P2.P)).astype(np.uint32))
    return out


@jax.jit
def _hash_level(cur):
    return P2.hash_pairs(cur[0::2], cur[1::2])


def commit_digests(digests) -> MerkleTree:
    """Build a tree over precomputed leaf digests (n, 8) Montgomery."""
    n = digests.shape[0]
    assert n & (n - 1) == 0
    return MerkleTree(layers=_build_layers_from_digests(digests),
                      n_leaves=n)


# ---------------------------------------------------------------------------
# Host-side verification (numpy, standard form)
# ---------------------------------------------------------------------------


def leaf_digest_np(row: np.ndarray) -> np.ndarray:
    """Hash one row of standard-form field elements to its leaf digest."""
    return P2.hash_rows_np(np.asarray(row, dtype=np.uint64)[None])[0]


def verify_many(root: np.ndarray, idxs, rows, paths, depth: int,
                width: int) -> bool:
    """Batched verify_path: all queries hash level-by-level together
    (2 host permutations per level instead of 2 per level PER query)."""
    rows = np.asarray(rows, dtype=np.uint64)
    q = rows.shape[0]
    if rows.shape != (q, width) or len(paths) != q or len(idxs) != q:
        return False
    pm = np.zeros((q, depth, P2.DIGEST_LEN), dtype=np.uint64)
    for i, p in enumerate(paths):
        p = np.asarray(p)
        if p.shape != (depth, P2.DIGEST_LEN):
            return False
        pm[i] = p
    idx = np.asarray(idxs, dtype=np.int64)
    if ((idx < 0) | (idx >= (1 << depth))).any():
        return False
    digest = P2.hash_rows_np(rows)
    for d in range(depth):
        sib = pm[:, d]
        odd = (idx & 1) == 1
        left = np.where(odd[:, None], sib, digest)
        right = np.where(odd[:, None], digest, sib)
        digest = P2.hash_pairs_np(left, right)
        idx >>= 1
    return bool((digest == np.asarray(root, dtype=np.uint64)[None]).all())


def verify_path(root: np.ndarray, idx: int, row: np.ndarray,
                path: np.ndarray, depth: int, width: int) -> bool:
    """Check a row + sibling path against a root. All standard form.

    ``depth`` (= log2 of the committed leaf count) and ``width`` (= the
    exact committed row width) are caller-supplied expectations: a path
    of any other length or a row of any other width is rejected, so an
    inner node can never be opened as a truncated-path "leaf"
    (ADVICE.md r1 finding #2).
    """
    row = np.asarray(row)
    path = np.asarray(path)
    if row.ndim != 1 or row.shape[0] != width:
        return False
    if path.shape != (depth, P2.DIGEST_LEN):
        return False
    if not (0 <= idx < (1 << depth)):
        return False
    digest = leaf_digest_np(row)
    for sibling in path:
        if idx & 1:
            digest = P2.hash_pairs_np(sibling[None], digest[None])[0]
        else:
            digest = P2.hash_pairs_np(digest[None], sibling[None])[0]
        idx >>= 1
    return bool((digest == np.asarray(root, dtype=np.uint64)).all())
