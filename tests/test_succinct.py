"""In-circuit verifier (lift/join) tests.

Ladder: compile the verifier program for a toy AIR -> witgen over a real
proof stream satisfies every constraint -> tampered streams / wrong
claims violate -> (gated) full lift+join+verify_root roundtrip and the
rv32im lift program over a real segment proof.
"""

import os

import numpy as np
import pytest

from zeth_tpu.circuits.toy import SquareChainAir
from zeth_tpu.field import P
from zeth_tpu.recursion import compiler, succinct, vm
from zeth_tpu.zkp import prover, verifier
from zeth_tpu.zkp.air import check_constraints

E2E = os.environ.get("ZETH_E2E", "0") == "1"

_CACHE = {}


def _toy_proof(po2=9):
    key = ("toy", po2)
    if key not in _CACHE:
        air = SquareChainAir()
        main, pubs = air.witgen(po2, x0=7)
        proof = prover.prove(air, main, pubs)
        _CACHE[key] = (air, proof, pubs)
    return _CACHE[key]


def _constraints_ok(vp, stream, claim):
    rair = vp.air()
    main, wom = rair.witgen(stream)
    control = rair.control_trace(vp.program.po2())
    chal = np.array([[3, 5, 7, 11], [13, 17, 19, 23]], dtype=np.uint64)
    aux = rair.build_aux(main, chal)
    return check_constraints(rair, control, main, aux,
                             publics=[int(x) for x in claim],
                             challenges=chal)


def test_lift_program_accepts_real_proof():
    air, proof, pubs = _toy_proof()
    vp = succinct.lift_program(air, proof.po2, len(pubs))
    stream = compiler.proof_to_stream(vp, proof)
    claim = compiler.claim_digest(proof.po2, pubs)
    assert _constraints_ok(vp, stream, claim) == {}


def test_lift_program_rejects_tampered_stream():
    air, proof, pubs = _toy_proof()
    vp = succinct.lift_program(air, proof.po2, len(pubs))
    claim = compiler.claim_digest(proof.po2, pubs)
    # tamper each of: a tap value, a root word, an opened row element
    base = compiler.proof_to_stream(vp, proof)
    for pos in (len(pubs) + 3,                    # main root word
                len(pubs) + 16 + 5,               # a tap component
                vp.program.n_stream - 9):         # late opening/path word
        stream = base.copy()
        stream[pos] = (stream[pos] + 1) % P
        bad = _constraints_ok(vp, stream, claim)
        assert bad, f"tamper at {pos} not caught"


def test_lift_program_rejects_wrong_claim():
    air, proof, pubs = _toy_proof()
    vp = succinct.lift_program(air, proof.po2, len(pubs))
    stream = compiler.proof_to_stream(vp, proof)
    wrong = compiler.claim_digest(proof.po2, [int(pubs[0]) + 1, pubs[1]])
    assert _constraints_ok(vp, stream, wrong)


def test_claim_tree_host_mirrors():
    c1 = compiler.claim_digest(9, [1, 2])
    c2 = compiler.claim_digest(9, [3, 4])
    root = succinct.expected_root_claim([9, 9], [[1, 2], [3, 4]])
    assert (root == succinct.join_claim(c1, c2)).all()
    assert not (c1 == c2).all()


@pytest.mark.skipif(not E2E, reason="slow e2e (set ZETH_E2E=1)")
def test_lift_join_verify_roundtrip():
    air, proof1, pubs1 = _toy_proof()
    main2, pubs2 = SquareChainAir().witgen(9, x0=11)
    proof2 = prover.prove(air, main2, pubs2)
    rec = succinct.aggregate(air, [proof1, proof2])
    succinct.verify_root(rec, air, [9, 9], [pubs1, pubs2])
    with pytest.raises(verifier.VerificationError):
        succinct.verify_root(rec, air, [9, 9],
                             [[int(pubs1[0]) + 1, pubs1[1]], pubs2])


@pytest.mark.skipif(not E2E, reason="slow e2e (set ZETH_E2E=1)")
def test_rv32im_lift_constraints():
    """The lift program accepts a real rv32im segment proof (including
    the in-circuit derived-challenge recomputation over the publics and
    the companion paging bindings: extra-mix root, d0/d1, g4/g5)."""
    from zeth_tpu.circuits import rv32im as rv
    from zeth_tpu.circuits.paging import PagingAir
    from zeth_tpu.executor import Executor, guests, load_image
    from zeth_tpu.zkp import proof as proof_mod
    elf = guests.echo_input(12)
    entry, ia, iw = load_image(elf)
    from zeth_tpu.zkvm import ExecutorEnv
    env = ExecutorEnv.builder().write(b"hello world!").build()
    res = Executor(elf, env.input_bytes, segment_po2=13, trace=True).run()
    air = rv.Rv32imAir(ia, iw)
    seals, pg_seals = rv.prove_segments(res.segments[:1], ia, iw)
    proof = proof_mod.decode(seals[0])
    pg_proof = proof_mod.decode(pg_seals[0])
    ppg = PagingAir.parse_publics([int(p) for p in pg_proof.publics])
    extra = (np.asarray(pg_proof.roots["main"], np.uint64),
             ppg["d0"], ppg["d1"], ppg["g4"], ppg["g5"])
    pubs = [int(p) for p in proof.publics]

    vp = succinct.lift_program(air, proof.po2, len(pubs),
                               succinct.publics_shape(air, pubs))
    stream = compiler.proof_to_stream(
        vp, proof, extra=(extra[0], extra[1], extra[2]))
    claim = compiler.claim_digest(proof.po2, pubs,
                                  succinct._extra_row(extra))
    assert _constraints_ok(vp, stream, claim) == {}
    # a forged d0 component breaks the in-circuit DEEP identity
    bad = (extra[0], (extra[1] + np.uint64(1)) % np.uint64(P),
           extra[2], extra[3], extra[4])
    stream_b = compiler.proof_to_stream(
        vp, proof, extra=(bad[0], bad[1], bad[2]))
    claim_b = compiler.claim_digest(proof.po2, pubs,
                                    succinct._extra_row(bad))
    assert _constraints_ok(vp, stream_b, claim_b) != {}


def test_accel_lift_constraints_and_claim_fold():
    """In-circuit resolve: an accelerator (keccak) batch proof lifts
    into the recursion circuit — the lift program recomputes the IO-RLC
    derived challenge from the claim-pinned publics — and its claim
    digest joins the root fold after the segment pairs."""
    from zeth_tpu.circuits import keccak as keccak_air_mod

    rng = np.random.default_rng(3)
    # prove_batch input contract: (n_perms, 25) 64-bit lanes
    lanes = rng.integers(0, np.iinfo(np.uint64).max, size=(1, 25),
                         dtype=np.uint64)
    seal, digest = keccak_air_mod.prove_batch(lanes)
    from zeth_tpu.zkp import proof as proof_mod
    pf = proof_mod.decode(seal)
    air = keccak_air_mod.KeccakAir()
    pubs = [int(p) for p in pf.publics]

    vp = succinct.lift_program(air, pf.po2, len(pubs),
                               succinct.publics_shape(air, pubs))
    stream = compiler.proof_to_stream(vp, pf)
    claim = compiler.claim_digest(pf.po2, pubs, None)
    assert _constraints_ok(vp, stream, claim) == {}

    # a tampered public IO limb changes the claim (rejected at fold
    # level) and breaks the in-circuit RLC recomputation
    bad_pubs = list(pubs)
    bad_pubs[1] = (bad_pubs[1] + 1) % P
    assert not (compiler.claim_digest(pf.po2, bad_pubs, None)
                == claim).all()

    # the fold with an accelerator claim appended mirrors
    # expected-root-claim semantics (pairs first, then accel claims)
    c1 = compiler.claim_digest(9, [1, 2])
    acc = compiler.claim_digest(pf.po2, pubs, None)
    want = succinct.join_claim(c1, acc)
    assert (succinct._fold_claims([c1, acc]) == want).all()
