"""End-to-end STARK: prove on device, verify on host, reject tampering."""

import numpy as np
import pytest

from zeth_tpu.field import P
from zeth_tpu.circuits.toy import PermutationAir, SquareChainAir
from zeth_tpu.zkp import prover, verifier
from zeth_tpu.zkp.verifier import VerificationError

PO2 = 6  # n = 64 rows; LDE 256 — small enough for CPU test runs


def test_square_chain_roundtrip():
    air = SquareChainAir()
    main, publics = SquareChainAir.witgen(PO2, x0=7)
    proof = prover.prove(air, main, publics)
    verifier.verify(air, proof, publics)


def test_square_chain_rejects_wrong_publics():
    air = SquareChainAir()
    main, publics = SquareChainAir.witgen(PO2, x0=7)
    proof = prover.prove(air, main, publics)
    bad = [publics[0], (publics[1] + 1) % P]
    with pytest.raises(VerificationError):
        verifier.verify(air, proof, bad)


def test_square_chain_rejects_invalid_witness():
    air = SquareChainAir()
    main, publics = SquareChainAir.witgen(PO2, x0=7)
    main = main.copy()
    main[13, 0] = (main[13, 0] + 1) % P  # break the chain mid-way
    proof = prover.prove(air, main, publics)
    with pytest.raises(VerificationError):
        verifier.verify(air, proof, publics)


def test_square_chain_rejects_tampered_taps():
    air = SquareChainAir()
    main, publics = SquareChainAir.witgen(PO2, x0=7)
    proof = prover.prove(air, main, publics)
    proof.taps = proof.taps.copy()
    proof.taps[1, 0] = (proof.taps[1, 0] + 1) % P
    with pytest.raises(VerificationError):
        verifier.verify(air, proof, publics)


def test_square_chain_rejects_tampered_opening():
    air = SquareChainAir()
    main, publics = SquareChainAir.witgen(PO2, x0=7)
    proof = prover.prove(air, main, publics)
    rows = proof.openings["main"].rows.copy()
    rows[0, 0] = (rows[0, 0] + 1) % P
    proof.openings["main"].rows = rows
    with pytest.raises(VerificationError):
        verifier.verify(air, proof, publics)


def test_permutation_roundtrip():
    air = PermutationAir()
    main, publics = PermutationAir.witgen(PO2, seed=3)
    proof = prover.prove(air, main, publics)
    verifier.verify(air, proof, publics)


def test_permutation_rejects_non_permutation():
    air = PermutationAir()
    main, publics = PermutationAir.witgen(PO2, seed=3)
    main = main.copy()
    main[5, 1] = (main[5, 1] + 1) % P  # b no longer a permutation of a
    proof = prover.prove(air, main, publics)
    with pytest.raises(VerificationError):
        verifier.verify(air, proof, publics)


def test_control_root_host_matches_device():
    """The verifier's host-only (numpy) control-group commit equals the
    prover's device commit bit-exactly — verification needs no device."""
    import jax.numpy as jnp

    from zeth_tpu.circuits.toy import SquareChainAir
    from zeth_tpu.hash import merkle
    from zeth_tpu.zkp import verifier
    from zeth_tpu.zkp.prover import _lde_group, _to_monty_np

    air = SquareChainAir()
    verifier._AIR_REGISTRY[air.name] = air
    host = verifier._expected_control_root(air.name, 9)
    _, lde = _lde_group(jnp.asarray(_to_monty_np(air.control_trace(9))))
    dev = tuple(int(v) for v in merkle.commit_rows(lde).root)
    assert host == dev


def test_streamed_main_bit_identical(monkeypatch):
    """The coset-streamed main-group path (po2>=20: shifted coefficients
    resident, per-coset recompute, MXU openings) produces a seal
    bit-identical to the resident-LDE path and verifies."""
    from zeth_tpu.circuits.toy import SquareChainAir
    from zeth_tpu.zkp import proof as proof_mod
    from zeth_tpu.zkp import prover, verifier

    air = SquareChainAir()
    main, publics = SquareChainAir.witgen(7, x0=5)
    p_resident = prover.prove(air, main, publics)
    monkeypatch.setattr(prover, "_STREAM_MAIN_BYTES", 1)
    p_streamed = prover.prove(air, main, publics)
    s1 = proof_mod.encode(p_resident)
    s2 = proof_mod.encode(p_streamed)
    assert (s1 == s2).all()
    verifier.verify(air, p_streamed, publics)
