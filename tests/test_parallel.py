"""Distributed NTT / commit on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from zeth_tpu import field as F, ntt
from zeth_tpu.field import P
from zeth_tpu.hash import merkle
from zeth_tpu.parallel import dist_coset_lde, dist_intt, dist_ntt, \
    sharded_commit_root

rng = np.random.default_rng(31)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("rows",))


def _sharded(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, PS("rows")))


def _monty(shape):
    std = rng.integers(0, P, size=shape, dtype=np.uint64)
    return ((std << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def test_dist_ntt_matches_local():
    mesh = _mesh()
    x = _monty((1024, 3))
    xd = _sharded(jnp.asarray(x), mesh)
    got = np.asarray(dist_ntt(xd, mesh))
    want = np.asarray(ntt.ntt(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_dist_intt_roundtrip():
    mesh = _mesh()
    x = _monty((512, 2))
    xd = _sharded(jnp.asarray(x), mesh)
    back = np.asarray(dist_intt(dist_ntt(xd, mesh), mesh))
    np.testing.assert_array_equal(back, x)


def test_dist_coset_lde_matches_local():
    mesh = _mesh()
    x = _monty((256, 2))
    xd = _sharded(jnp.asarray(x), mesh)
    got = np.asarray(dist_coset_lde(xd, mesh))
    want = np.asarray(ntt.coset_lde(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_sharded_commit_root_matches_local():
    mesh = _mesh()
    x = _monty((256, 9))
    xd = _sharded(jnp.asarray(x), mesh)
    got = np.asarray(sharded_commit_root(xd, mesh))
    tree = merkle.commit_rows(jnp.asarray(x))
    want = np.asarray(tree.layers[0])[0]
    np.testing.assert_array_equal(got, want)
