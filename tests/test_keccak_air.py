"""Keccak accelerator circuit: witgen validity, output binding, tampering."""

import numpy as np

from zeth_tpu.circuits.keccak import (KeccakAir, S_OFF, choose_po2,
                                      claims_digest)
from zeth_tpu.hash.keccak import permute_np
from zeth_tpu.zkp.air import check_constraints

rng = np.random.default_rng(5)
CHAL = np.zeros((0, 4), dtype=np.uint64)


def _witness(nperm=3):
    states = rng.integers(0, 2**64, (nperm, 25), dtype=np.uint64)
    air = KeccakAir()
    po2 = choose_po2(nperm)
    main, pubs = KeccakAir.witgen(states, po2)
    ctrl = air.control_trace(po2)
    return states, air, ctrl, main, pubs


def test_witness_satisfies_constraints():
    _, air, ctrl, main, pubs = _witness()
    assert check_constraints(air, ctrl, main, None, pubs, CHAL) == {}


def test_output_rows_are_keccak_f():
    states, air, ctrl, main, pubs = _witness()
    out = permute_np(states)
    for p in range(states.shape[0]):
        row = main[p * 32 + 24]
        lanes = np.zeros(25, dtype=np.uint64)
        for l in range(25):
            for z in range(64):
                lanes[l] |= np.uint64(row[S_OFF + l * 64 + z]) << np.uint64(z)
        assert (lanes == out[p]).all()


def test_tampered_round_state_detected():
    _, air, ctrl, main, pubs = _witness()
    main = main.copy()
    main[5, S_OFF + 7] ^= 1
    assert check_constraints(air, ctrl, main, None, pubs, CHAL) != {}


def test_tampered_output_row_detected():
    _, air, ctrl, main, pubs = _witness()
    main = main.copy()
    main[24, S_OFF + 100] ^= 1   # output of permutation 0
    assert check_constraints(air, ctrl, main, None, pubs, CHAL) != {}


def test_claims_digest_sensitive_to_io():
    states = rng.integers(0, 2**64, (2, 25), dtype=np.uint64)
    outs = permute_np(states)
    d1 = claims_digest(states, outs)
    states2 = states.copy()
    states2[0, 0] ^= 1
    d2 = claims_digest(states2, outs)
    assert (d1 != d2).any()
