"""Paging AIR: page-tree witgen satisfies constraints; tampering with
page contents, roots, siblings, touch flags or the d0/d1 publics is
caught in-circuit. The d0/d1 sums are checked against the rv32im RAM
boundary list sums they discharge (circuits/rv32im.py _list_sum)."""

import numpy as np
import pytest

from zeth_tpu import hostmath as H
from zeth_tpu.circuits import paging as PG
from zeth_tpu.circuits.rv32im import _list_sum
from zeth_tpu.hash import pagetree as PT
from zeth_tpu.zkp.air import check_constraints

G4 = np.array([11111, 22, 3, 4], np.uint64)
G5 = np.array([55555, 1, 2, 9], np.uint64)
NOCHAL = np.zeros((0, 4), np.uint64)


def _segment(mem_addrs, mem_pre, mem_post, seed_words=()):
    tree = PT.SparsePageTree()
    for addr, w in seed_words:
        tree.set_word(addr, w)
    return PG.segment_witness(tree, np.asarray(mem_addrs, np.uint64),
                              np.asarray(mem_pre, np.uint64),
                              np.asarray(mem_post, np.uint64))


def _witness(mem_addrs=(0x1000, 0x1004, 0x2000),
             mem_pre=(123, 0, 77), mem_post=(5, 6, 77),
             seed_words=((0x1000, 123), (0x2000, 77))):
    pn, prep, postp, tch, sibs, r0, r1 = _segment(
        mem_addrs, mem_pre, mem_post, seed_words)
    air = PG.PagingAir()
    main, pubs = air.witgen(pn, prep, postp, tch, sibs, r0, r1, G4, G5)
    return air, main, pubs


def _check(air, main, pubs, rebuild_aux=True, aux=None):
    if aux is None:
        chal = air.derived_challenges(pubs, NOCHAL)
        aux = air.build_aux(main, chal)
    ctrl = air.control_trace(int(np.log2(main.shape[0])))
    return check_constraints(air, ctrl, main, aux, pubs, NOCHAL)


def test_witness_satisfies_constraints():
    air, main, pubs = _witness()
    assert _check(air, main, pubs) == {}


def test_empty_segment_satisfies_constraints():
    # no touched pages: pre_root == post_root, d0 = d1 = 0
    air, main, pubs = _witness(mem_addrs=(), mem_pre=(), mem_post=(),
                               seed_words=((0x5000, 9),))
    pp = PG.PagingAir.parse_publics(pubs)
    assert (pp["pre_root"] == pp["post_root"]).all()
    assert not pp["d0"].any() and not pp["d1"].any()
    assert _check(air, main, pubs) == {}


def test_d0_d1_match_rv32im_list_sums():
    mem_addrs = np.array([0x1000, 0x1004, 0x2000], np.uint64)
    mem_pre = np.array([123, 0, 77], np.uint64)
    mem_post = np.array([5, 6, 77], np.uint64)
    _, main, pubs = _witness()
    g5p = H.ext_powers(H.ext(G5), 3)
    d0_ref = _list_sum([(int(a), int(v))
                        for a, v in zip(mem_addrs, mem_pre)],
                       H.ext(G4), g5p)
    d1_ref = _list_sum([(int(a), int(v))
                        for a, v in zip(mem_addrs, mem_post)],
                       H.ext(G4), g5p)
    pp = PG.PagingAir.parse_publics(pubs)
    assert (pp["d0"] == d0_ref).all()
    assert (pp["d1"] == d1_ref).all()


def test_forged_pre_value_detected():
    """Claiming a different pre value for a touched word must break the
    pre-leaf hash against the committed pre_root (even with the aux and
    d0 publics recomputed consistently)."""
    air, main, pubs = _witness()
    L = PG.LAYOUT
    rows = np.where((main[:, L.idx("tp0")] == 1))[0]
    r = rows[0]
    main[r, L.idx("wp0", 0)] ^= 1
    # aux rebuilds from the tampered trace: acc0(last) != d0 public
    assert _check(air, main, pubs) != {}


def test_forged_pre_value_with_consistent_d0_detected():
    air, main, pubs = _witness()
    L = PG.LAYOUT
    rows = np.where((main[:, L.idx("tp0")] == 1))[0]
    r = rows[0]
    main[r, L.idx("wp0", 0)] ^= 1
    # recompute d0 to match the forged word: the leaf hash no longer
    # matches the root path
    chal = PG.PagingAir().derived_challenges(pubs, NOCHAL)
    aux = air.build_aux(main, chal)
    acc0 = aux[-1, 16:20]
    bad = list(pubs)
    for c in range(4):
        bad[48 + 2 * c] = int(acc0[c]) & 0xFFFF
        bad[48 + 2 * c + 1] = int(acc0[c]) >> 16
    aux2 = air.build_aux(main, air.derived_challenges(bad, NOCHAL))
    assert _check(air, main, bad, aux=aux2) != {}


def test_forged_post_value_without_touch_detected():
    """post word may differ from pre only where the touch flag is set."""
    air, main, pubs = _witness()
    L = PG.LAYOUT
    ctrl = air.control_trace(int(np.log2(main.shape[0])))
    rows = np.where((ctrl[:, PG.C_DAT] == 1)
                    & (main[:, L.idx("tp0")] == 0)
                    & (main[:, L.idx("act")] == 1))[0]
    main[rows[0], L.idx("wq0", 3)] ^= 1
    assert _check(air, main, pubs) != {}


def test_touch_in_inactive_slot_detected():
    """d-terms must not be claimable from non-root-verified slots."""
    air, main, pubs = _witness(mem_addrs=(0x1000,), mem_pre=(123,),
                               mem_post=(5,))
    L = PG.LAYOUT
    ctrl = air.control_trace(int(np.log2(main.shape[0])))
    rows = np.where((ctrl[:, PG.C_DAT] == 1)
                    & (main[:, L.idx("act")] == 0))[0]
    assert len(rows)
    main[rows[0], L.idx("tp0")] = 1
    assert _check(air, main, pubs) != {}


def test_forged_root_public_detected():
    air, main, pubs = _witness()
    bad = list(pubs)
    bad[32] ^= 1          # post_root cell 0 lo limb
    assert _check(air, main, bad) != {}


def test_forged_sibling_detected():
    air, main, pubs = _witness()
    L = PG.LAYOUT
    ctrl = air.control_trace(int(np.log2(main.shape[0])))
    rows = np.where(ctrl[:, PG.C_PAB] == 1)[0]
    r = rows[0]   # first path-inject row of slot 0
    main[r, L.idx("sib", 2)] ^= 1
    assert _check(air, main, pubs) != {}


def test_forged_page_index_detected():
    """Flipping a page-index bit redirects the tree path AND the d0/d1
    word addresses; either binding must break."""
    air, main, pubs = _witness()
    L = PG.LAYOUT
    sl = slice(0, PG.SLOT_ROWS)
    main[sl, L.idx("pg", 0)] ^= 1
    assert _check(air, main, pubs) != {}


def test_prove_verify_roundtrip():
    """The paging AIR through the real prover + verifier, plus tamper,
    plus the pre-committed-main reuse path (prove_segments' flow)."""
    from zeth_tpu.zkp import proof as proof_mod
    from zeth_tpu.zkp import prover, verifier
    air, main, pubs = _witness()
    proof = prover.prove(air, main, pubs)
    verifier.verify(air, proof, pubs)
    root, handle = prover.commit_main(air, main)
    assert (root == np.asarray(proof.roots["main"], np.uint64)).all()
    proof2 = prover.prove(air, main, pubs, main_commit=handle)
    np.testing.assert_array_equal(proof_mod.encode(proof),
                                  proof_mod.encode(proof2))
    bad = list(pubs)
    bad[48] ^= 1          # d0 limb
    with pytest.raises(verifier.VerificationError):
        verifier.verify(air, proof, bad)
