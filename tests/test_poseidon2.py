"""Poseidon2: device (Montgomery uint32) vs host (uint64) ground truth."""

import numpy as np
import jax.numpy as jnp

from zeth_tpu import field as F
from zeth_tpu.hash import poseidon2 as P2
from zeth_tpu.field import P

rng = np.random.default_rng(7)


def to_monty_np(x):
    return ((np.asarray(x, np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def from_monty_dev(x):
    return np.asarray(F.from_monty(x), dtype=np.uint64)


def test_constants_well_formed():
    c = P2.constants()
    assert c["rc_ext"].shape == (8, 24)
    assert c["rc_int"].shape == (21,)
    assert c["diag"].shape == (24,)
    assert (c["rc_ext"] < P).all() and (c["rc_int"] < P).all()
    assert len(set(int(x) for x in c["diag"])) == 24


def test_permute_device_matches_host():
    state = rng.integers(0, P, size=(24, 37), dtype=np.uint64)
    want = P2.permute_np(state)
    got = from_monty_dev(P2.permute(jnp.asarray(to_monty_np(state))))
    np.testing.assert_array_equal(got, want)


def test_permute_not_identity_and_avalanche():
    z = np.zeros((24, 1), dtype=np.uint64)
    out0 = P2.permute_np(z)
    assert (out0 != 0).any()
    z1 = z.copy()
    z1[5, 0] = 1
    out1 = P2.permute_np(z1)
    # single-element change flips essentially every cell
    assert (out0 != out1).sum() >= 22


def test_hash_rows_matches_host_multi_block():
    # k=40 spans 3 rate-16 blocks (16+16+8)
    rows = rng.integers(0, P, size=(11, 40), dtype=np.uint64)
    want = P2.hash_rows_np(rows)
    got = from_monty_dev(P2.hash_rows(jnp.asarray(to_monty_np(rows))))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (11, 8)


def test_hash_pairs_matches_host():
    l = rng.integers(0, P, size=(9, 8), dtype=np.uint64)
    r = rng.integers(0, P, size=(9, 8), dtype=np.uint64)
    want = P2.hash_pairs_np(l, r)
    got = from_monty_dev(P2.hash_pairs(jnp.asarray(to_monty_np(l)),
                                       jnp.asarray(to_monty_np(r))))
    np.testing.assert_array_equal(got, want)
    # order matters
    assert (P2.hash_pairs_np(r, l) != want).any()
