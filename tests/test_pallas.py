"""Pallas kernels vs their XLA oracles (interpret mode on the CPU mesh).

The kernels themselves target real TPU hardware (zeth_tpu/pallas/); on
the CPU test mesh they run through the Pallas interpreter, which checks
the same program logic bit-for-bit against the XLA reference paths.
On-chip validation is tools/check_pallas.py.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from zeth_tpu import field as F
from zeth_tpu.hash import poseidon2 as P2


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def test_leaf_hash_matches_xla(monkeypatch):
    from zeth_tpu.pallas import poseidon2 as PP
    rng = np.random.default_rng(7)
    for r, c in [(1024, 5), (1024, 16), (2048, 37)]:
        m = jnp.asarray(rng.integers(0, F.P, size=(r, c), dtype=np.uint32))
        got = PP.hash_rows(m)
        want = P2.hash_rows(m)
        assert jnp.array_equal(got, want), (r, c)
    # multi-slab path (sponge state carried across absorb calls)
    monkeypatch.setattr(PP, "SLAB_BYTES", 1024 * 4 * 32)
    m = jnp.asarray(rng.integers(0, F.P, size=(1024, 100), dtype=np.uint32))
    assert jnp.array_equal(PP.hash_rows(m), P2.hash_rows(m))


def test_leaf_hash_matches_host_ground_truth():
    from zeth_tpu.pallas import poseidon2 as PP
    rng = np.random.default_rng(8)
    std = rng.integers(0, F.P, size=(1024, 20), dtype=np.uint64)
    m = F.to_monty(jnp.asarray(std.astype(np.uint32)))
    got = np.asarray(F.from_monty(PP.hash_rows(m))).astype(np.uint64)
    want = P2.hash_rows_np(std)
    assert (got == want).all()


def test_supported_predicate():
    from zeth_tpu.pallas import poseidon2 as PP
    assert PP.supported((1024, 3))
    assert PP.supported((1 << 20, 1009))
    assert not PP.supported((512, 3))
    assert not PP.supported((1536, 3))
