"""Bigint2 accelerator circuit: modmul witness validity, IO binding,
tampering (the risc0-bigint2 role, SURVEY.md §2.2)."""

import numpy as np
import pytest

from zeth_tpu.circuits.bigint2 import (ACT_COL, Bigint2Air, LIMBS, Q_OFF,
                                       R_OFF, choose_po2, claims_digest,
                                       parse_publics)
from zeth_tpu.zkp.air import check_constraints

rng = np.random.default_rng(7)
CHAL = np.array([[123456789, 7, 2, 9]], dtype=np.uint64)

SECP_P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
SECP_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141


def _rand256():
    return int.from_bytes(rng.bytes(32), "big")


def _witness(nop=3):
    ops = [(_rand256() % SECP_P, _rand256() % SECP_P, SECP_P)
           for _ in range(nop - 1)]
    ops.append((_rand256() % SECP_N, _rand256() % SECP_N, SECP_N))
    air = Bigint2Air()
    po2 = choose_po2(nop)
    main, pubs = Bigint2Air.witgen(ops, po2)
    ctrl = air.control_trace(po2)
    return ops, air, ctrl, main, pubs


def _check(air, ctrl, main, pubs):
    chal_all = np.concatenate(
        [CHAL, np.asarray(air.derived_challenges(pubs, CHAL), np.uint64)])
    aux = air.build_aux(main.astype(np.uint64), chal_all)
    return check_constraints(air, ctrl, main, aux, pubs, CHAL)


def test_witness_satisfies_constraints():
    _, air, ctrl, main, pubs = _witness()
    assert _check(air, ctrl, main, pubs) == {}


def test_publics_carry_correct_results():
    ops, air, ctrl, main, pubs = _witness(2)
    for (a, b, m), (pa, pb, pm, pr) in zip(ops, parse_publics(pubs)):
        assert (pa, pb, pm) == (a, b, m)
        assert pr == a * b % m


def test_forged_remainder_detected():
    """Claiming a wrong remainder must break the convolution identity
    (or the RLC if only the public is changed)."""
    ops, air, ctrl, main, pubs = _witness(2)
    bad = main.copy()
    bad[0, R_OFF] ^= 1                   # flip a bit of r on row 0
    assert _check(air, ctrl, bad, pubs) != {}
    # also flip the matching public limb: conv identity now fails
    bad_pubs = list(pubs)
    bad_pubs[1 + 3 * LIMBS] ^= 1
    assert _check(air, ctrl, bad, bad_pubs) != {}


def test_forged_public_io_detected():
    _, air, ctrl, main, pubs = _witness(2)
    bad = list(pubs)
    bad[2] ^= 1                          # an input limb of op 0
    assert _check(air, ctrl, main, bad) != {}


def test_noncanonical_remainder_detected():
    """r' = r + m with q' = q - 1 satisfies a*b = q'*m + r' but violates
    the r < m borrow check."""
    air = Bigint2Air()
    m = 0xFFFF_FFFF_0000_0001
    a, b = 0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321
    q, r = divmod(a * b, m)
    po2 = choose_po2(1)
    main, pubs = Bigint2Air.witgen([(a, b, m)], po2)
    # hand-forge: r' = r + m, q' = q - 1 (re-witgen carries via a fake op
    # whose divmod would produce them is impossible — so patch bits)
    from zeth_tpu.circuits import bigint2 as bi
    forged = main.copy()
    rp, qp = r + m, q - 1
    for off, val in ((bi.R_OFF, rp), (bi.Q_OFF, qp)):
        for li in range(LIMBS):
            lv = (val >> (16 * li)) & 0xFFFF
            for z in range(16):
                forged[0, off + li * 16 + z] = (lv >> z) & 1
    # recompute carries for the forged identity so only the range check
    # can catch it
    al = [(a >> (16 * i)) & 0xFFFF for i in range(LIMBS)]
    bl = [(b >> (16 * i)) & 0xFFFF for i in range(LIMBS)]
    ml = [(m >> (16 * i)) & 0xFFFF for i in range(LIMBS)]
    ql = [(qp >> (16 * i)) & 0xFFFF for i in range(LIMBS)]
    rl = [(rp >> (16 * i)) & 0xFFFF for i in range(LIMBS)]
    c = 0
    for k in range(2 * LIMBS - 1):
        conv_ab = sum(al[i] * bl[k - i]
                      for i in range(max(0, k - LIMBS + 1),
                                     min(k, LIMBS - 1) + 1))
        conv_qm = sum(ql[i] * ml[k - i]
                      for i in range(max(0, k - LIMBS + 1),
                                     min(k, LIMBS - 1) + 1))
        t = conv_ab - conv_qm - (rl[k] if k < LIMBS else 0) + c
        assert t % (1 << 16) == 0
        c = t >> 16
        enc = c + (1 << bi.CARRY_BITS)
        for z in range(bi.CARRY_BITS + 1):
            forged[0, bi.CAR_OFF + k * (bi.CARRY_BITS + 1) + z] = \
                (enc >> z) & 1
    assert c == 0
    bad_pubs = list(pubs)
    for li in range(LIMBS):
        bad_pubs[1 + 3 * LIMBS + li] = (rp >> (16 * li)) & 0xFFFF
    ctrl = air.control_trace(po2)
    assert _check(air, ctrl, forged, bad_pubs) != {}


def test_claims_digest_sensitive():
    ops, air, ctrl, main, pubs = _witness(2)
    io = parse_publics(pubs)
    d1 = claims_digest(io)
    io2 = [tuple(x + (1 if j == 3 else 0) for j, x in enumerate(op))
           for op in io[:1]] + io[1:]
    assert (d1 != claims_digest(io2)).any()


def test_parse_publics_rejects_malformed():
    with pytest.raises(ValueError):
        parse_publics([])
    with pytest.raises(ValueError):
        parse_publics([1, 2, 3])
    bad = [1] + [0] * (4 * LIMBS)        # m == 0
    with pytest.raises(ValueError):
        parse_publics(bad)


def test_prove_verify_roundtrip():
    """Full prove+verify of a small batch (the e2e oracle)."""
    from zeth_tpu.circuits.bigint2 import prove_batch, verify_batch
    ops = [(3, 5, 7), (SECP_P - 1, SECP_P - 2, SECP_P)]
    seal, digest = prove_batch(ops)
    io = verify_batch(seal)
    assert io[0] == (3, 5, 7, 1)
    assert io[1][3] == (SECP_P - 1) * (SECP_P - 2) % SECP_P
    assert (claims_digest(io) == digest).all()
