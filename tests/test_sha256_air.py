"""SHA-256 accelerator circuit: witgen validity, IO binding, tampering
(the reference's patched-sha2 precompile role, SURVEY.md §2.1)."""

import numpy as np
import pytest

from zeth_tpu.circuits.sha256 import (ACT_COL, DIG_OFF, S_OFF, Sha256Air,
                                      choose_po2, claims_digest,
                                      parse_publics)
from zeth_tpu.zkp.air import check_constraints

rng = np.random.default_rng(11)
CHAL = np.array([[31415926, 2, 8, 5]], dtype=np.uint64)


def _witness(nc=2):
    states = rng.integers(0, 2**32, (nc, 8), dtype=np.uint64)
    blocks = rng.integers(0, 2**32, (nc, 16), dtype=np.uint64)
    air = Sha256Air()
    po2 = choose_po2(nc)
    main, pubs = Sha256Air.witgen(states, blocks, po2)
    ctrl = air.control_trace(po2)
    return states, blocks, air, ctrl, main, pubs


def _check(air, ctrl, main, pubs):
    chal_all = np.concatenate(
        [CHAL, np.asarray(air.derived_challenges(pubs, CHAL), np.uint64)])
    aux = air.build_aux(main.astype(np.uint64), chal_all)
    return check_constraints(air, ctrl, main, aux, pubs, CHAL)


def test_witness_satisfies_constraints():
    _, _, air, ctrl, main, pubs = _witness()
    assert _check(air, ctrl, main, pubs) == {}


def test_digest_matches_host_kernel():
    import jax.numpy as jnp

    from zeth_tpu.hash.sha256 import compress
    states, blocks, air, ctrl, main, pubs = _witness()
    out = np.asarray(compress(jnp.asarray(states, jnp.uint32),
                              jnp.asarray(blocks, jnp.uint32)), np.uint64)
    for c, (st, blk, dig) in enumerate(parse_publics(pubs)):
        assert st == [int(x) for x in states[c]]
        assert blk == [int(x) for x in blocks[c]]
        assert dig == [int(x) for x in out[c]]


def test_sha256_of_abc_vector():
    """FIPS 180-4 'abc' single-block vector through the circuit witgen."""
    from zeth_tpu.hash.sha256 import IV, pad_message
    block = pad_message(b"abc")[0]
    main, pubs = Sha256Air.witgen(IV[None].astype(np.uint64),
                                  block[None].astype(np.uint64),
                                  choose_po2(1))
    (_, _, dig) = parse_publics(pubs)[0]
    got = b"".join(int(w).to_bytes(4, "big") for w in dig)
    import hashlib
    assert got == hashlib.sha256(b"abc").digest()


def test_tampered_round_state_detected():
    _, _, air, ctrl, main, pubs = _witness()
    main = main.copy()
    main[5, S_OFF + 7] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_tampered_digest_detected():
    _, _, air, ctrl, main, pubs = _witness()
    main = main.copy()
    main[64, DIG_OFF + 3] ^= 1          # output row of compression 0
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_public_io_detected():
    _, _, air, ctrl, main, pubs = _witness()
    bad = list(pubs)
    bad[3] ^= 1
    assert _check(air, ctrl, main, bad) != {}


def test_hidden_compression_detected():
    from zeth_tpu.circuits.sha256 import ROWS_PER_COMP
    _, _, air, ctrl, main, pubs = _witness(2)
    main = main.copy()
    main[ROWS_PER_COMP:2 * ROWS_PER_COMP, ACT_COL] = 0
    assert _check(air, ctrl, main, pubs) != {}


def test_claims_digest_sensitive():
    _, _, air, ctrl, main, pubs = _witness(2)
    io = parse_publics(pubs)
    d1 = claims_digest(io)
    io2 = [(io[0][0], io[0][1], [io[0][2][0] ^ 1] + io[0][2][1:])] + io[1:]
    assert (d1 != claims_digest(io2)).any()


def test_parse_publics_rejects_malformed():
    with pytest.raises(ValueError):
        parse_publics([])
    with pytest.raises(ValueError):
        parse_publics([1, 2, 3])
