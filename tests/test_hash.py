"""SHA-256 / Keccak-f device kernels vs ground truth; Merkle commit/verify."""

import hashlib

import numpy as np
import jax.numpy as jnp

from zeth_tpu import field as F
from zeth_tpu.field import P
from zeth_tpu.hash import keccak, merkle, sha256

rng = np.random.default_rng(11)


# -- SHA-256 -----------------------------------------------------------------


def test_sha256_single_block_vs_hashlib():
    msgs = [rng.bytes(20) for _ in range(5)]
    blocks = np.stack([sha256.pad_message(m) for m in msgs])  # (5, 1, 16)
    got = np.asarray(sha256.hash_blocks(jnp.asarray(blocks)))
    for i, m in enumerate(msgs):
        want = sha256.words_be(hashlib.sha256(m).digest())
        np.testing.assert_array_equal(got[i], want)


def test_sha256_multi_block_vs_hashlib():
    m = rng.bytes(200)  # 4 blocks after padding
    blocks = sha256.pad_message(m)[None]
    got = np.asarray(sha256.hash_blocks(jnp.asarray(blocks)))[0]
    want = sha256.words_be(hashlib.sha256(m).digest())
    np.testing.assert_array_equal(got, want)


def test_sha256_pair_combine_matches_manual_compression():
    l = rng.integers(0, 2**32, size=(3, 8), dtype=np.uint32)
    r = rng.integers(0, 2**32, size=(3, 8), dtype=np.uint32)
    got = np.asarray(sha256.hash_pairs(jnp.asarray(l), jnp.asarray(r)))
    # reference: single unpadded compression of the 64-byte concatenation
    for i in range(3):
        blk = np.concatenate([l[i], r[i]])[None, None, :]
        state = np.asarray(sha256.compress(
            jnp.broadcast_to(jnp.asarray(sha256.IV), (1, 8)).astype(jnp.uint32),
            jnp.asarray(blk[0])))
        np.testing.assert_array_equal(got[i], state[0])


# -- Keccak ------------------------------------------------------------------


def test_keccak_device_matches_host():
    st = rng.integers(0, 2**64, size=(7, 25), dtype=np.uint64)
    want = keccak.permute_np(st)
    got32 = np.asarray(keccak.permute(jnp.asarray(keccak.split_u64(st))))
    np.testing.assert_array_equal(keccak.join_u64(got32), want)


def test_keccak256_known_vectors():
    # Ethereum keccak-256 of empty string (public vector)
    assert keccak.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")


def test_keccak256_rate_boundary():
    # exercise the multi-block absorb path (136-byte rate)
    for n in (135, 136, 137, 272):
        out = keccak.keccak256(b"\x5a" * n)
        assert len(out) == 32


# -- Merkle ------------------------------------------------------------------


def test_merkle_commit_open_verify():
    rows_std = rng.integers(0, P, size=(16, 5), dtype=np.uint64)
    monty = ((rows_std << np.uint64(32)) % np.uint64(P)).astype(np.uint32)
    tree = merkle.commit_rows(jnp.asarray(monty))
    root = tree.root
    for idx in (0, 7, 15):
        path = tree.open(idx)
        assert path.shape == (4, 8)
        assert merkle.verify_path(root, idx, rows_std[idx], path,
                                  depth=4, width=5)
        # tampered row fails
        bad = rows_std[idx].copy()
        bad[0] = (bad[0] + 1) % P
        assert not merkle.verify_path(root, idx, bad, path, depth=4, width=5)
        # wrong index fails
        assert not merkle.verify_path(root, idx ^ 1, rows_std[idx], path,
                                      depth=4, width=5)
        # truncated path / wrong expected depth fails
        assert not merkle.verify_path(root, idx, rows_std[idx], path[:3],
                                      depth=4, width=5)
        assert not merkle.verify_path(root, idx, rows_std[idx], path,
                                      depth=3, width=5)
        # wrong width fails
        assert not merkle.verify_path(root, idx, rows_std[idx], path,
                                      depth=4, width=6)


def test_merkle_leaf_node_domain_separation():
    """A 16-element leaf row must not hash like an inner digest pair."""
    import zeth_tpu.hash.poseidon2 as P2
    row = rng.integers(0, P, size=(1, 16), dtype=np.uint64)
    leaf = P2.hash_rows_np(row)[0]
    pair = P2.hash_pairs_np(row[:, :8], row[:, 8:])[0]
    assert not (leaf == pair).all()
