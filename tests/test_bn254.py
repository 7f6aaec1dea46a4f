"""BN254 pairing, the EVM pairing precompile, and the Groth16 verifier."""

import pytest

from zeth_tpu.app import bn254 as B
from zeth_tpu.zkp.groth16 import (Groth16Error, Proof, VerifyingKey, g1_mul,
                                  g1_neg, verify)

G1 = (1, 2)
G2 = ((10857046999023057135944570762232829481370756359578518086990519993285655852781,
       11559732032986387107991004021392285783925812861821192530917403151452391805634),
      (8495653923123431417604973247489272438418190587263600148770280649306958101930,
       4082367875863433681332203403145435568316851327593401208105741076214120093531))


def test_pairing_bilinearity():
    e = B.pairing(G2, G1)
    assert e != B.F12_ONE
    assert B.f12_pow(e, B.R) == B.F12_ONE
    assert B.pairing(G2, g1_mul(G1, 5)) == B.f12_pow(e, 5)
    assert B.pairing(B.g2_mul(G2, 5), G1) == B.f12_pow(e, 5)


def test_pairing_check_product():
    a, b = 13, 29
    assert B.pairing_check([(g1_mul(G1, a), B.g2_mul(G2, b)),
                            (g1_mul(G1, a * b), B.g2_neg(G2))])
    assert not B.pairing_check([(g1_mul(G1, a), B.g2_mul(G2, b)),
                                (g1_mul(G1, a * b + 1), B.g2_neg(G2))])
    assert B.pairing_check([])          # empty product is one
    with pytest.raises(ValueError):
        B.pairing_check([((1, 3), G2)])  # not on curve


def test_groth16_verify_synthetic():
    """Exponent-constructed vk/proof satisfying the Groth16 equation."""
    r = B.R
    alpha, beta, gamma, delta = 5, 7, 11, 13
    i0, i1 = 17, 19
    x = 12345                               # the public input
    a, b = 23, 31
    c = (a * b - alpha * beta - (i0 + x * i1) * gamma) \
        * pow(delta, r - 2, r) % r
    vk = VerifyingKey(
        alpha_g1=g1_mul(G1, alpha), beta_g2=B.g2_mul(G2, beta),
        gamma_g2=B.g2_mul(G2, gamma), delta_g2=B.g2_mul(G2, delta),
        ic=[g1_mul(G1, i0), g1_mul(G1, i1)])
    proof = Proof(a=g1_mul(G1, a), b=B.g2_mul(G2, b), c=g1_mul(G1, c))
    verify(vk, proof, [x])
    with pytest.raises(Groth16Error):
        verify(vk, proof, [x + 1])
    with pytest.raises(Groth16Error):
        verify(vk, Proof(a=g1_neg(proof.a), b=proof.b, c=proof.c), [x])


def test_pairing_precompile_in_evm():
    """Call precompile 0x08 through the EVM with a valid pair product."""
    from zeth_tpu.app.evm import BlockEvm
    from zeth_tpu.app.state import SparseState
    from zeth_tpu.app.trie import Trie
    from zeth_tpu.app.state import Account, EMPTY_CODE_HASH
    from zeth_tpu.app.trie import EMPTY_ROOT
    from zeth_tpu.hash.keccak import keccak256

    alice = b"\x11" * 20
    t = Trie()
    t.insert(keccak256(alice),
             Account(0, 10**18, EMPTY_ROOT, EMPTY_CODE_HASH).encode())
    state = SparseState(t.root_hash(), t.rlp_nodes())
    be = BlockEvm(state, {})
    be.set_block(coinbase=b"\x33" * 20, number=1, timestamp=1, gas_limit=10**7,
                 basefee=0, prevrandao=b"\x00" * 32, blob_basefee=0,
                 chain_id=1)

    def enc_pair(p1, q2):
        out = p1[0].to_bytes(32, "big") + p1[1].to_bytes(32, "big")
        out += q2[0][1].to_bytes(32, "big") + q2[0][0].to_bytes(32, "big")
        out += q2[1][1].to_bytes(32, "big") + q2[1][0].to_bytes(32, "big")
        return out

    a, b = 3, 9
    data = enc_pair(g1_mul(G1, a), B.g2_mul(G2, b)) + \
        enc_pair(g1_mul(G1, a * b), B.g2_neg(G2))
    res = be.exec_tx(sender=alice, to=b"\x00" * 19 + b"\x08", value=0,
                     gas_limit=500_000, eff_gas_price=0, tip_per_gas=0,
                     data=data, nonce=0)
    assert res.status == 1
    # 45000 + 2*34000 pairing gas + 21000 intrinsic + calldata
    assert res.gas_used > 45000 + 68000 + 21000


def test_groth16_prove_e2e():
    """R1CS -> QAP -> setup -> prove -> verify, with tamper rejection.

    Circuit (the classic): prove knowledge of x with x^3 + x + 5 == out.
    Wires: [1, out, x, x2, x3]; out public.
    """
    from zeth_tpu.zkp.groth16 import R1CS, prove, setup

    r = B.R
    r1cs = R1CS(n_wires=5, n_pub=1, constraints=[
        ({2: 1}, {2: 1}, {3: 1}),                 # x * x = x2
        ({3: 1}, {2: 1}, {4: 1}),                 # x2 * x = x3
        ({4: 1, 2: 1, 0: 5}, {0: 1}, {1: 1}),     # (x3 + x + 5) * 1 = out
    ])
    x = 3
    out = (x ** 3 + x + 5) % r
    witness = [1, out, x, x * x % r, x ** 3 % r]
    assert r1cs.check(witness)

    # deterministic "randomness" so the test is reproducible
    seq = iter([1234567, 7654321, 111, 222, 333, 444, 555])
    pk = setup(r1cs, rng=lambda: next(seq))
    proof = prove(pk, r1cs, witness, rng=lambda: next(seq))
    verify(pk.vk, proof, [out])

    with pytest.raises(Groth16Error):
        verify(pk.vk, proof, [(out + 1) % r])
    with pytest.raises(Groth16Error):
        verify(pk.vk, Proof(a=proof.a, b=proof.b, c=g1_mul(proof.c, 2)),
               [out])
    # a bad witness is refused at prove time
    bad = [1, out, x + 1, (x + 1) ** 2 % r, (x + 1) ** 3 % r]
    with pytest.raises(Groth16Error):
        prove(pk, r1cs, bad, rng=lambda: 7)


def test_groth16_prove_random_blinding():
    """Fresh setup + random r/s blinding still verifies; zero-knowledge
    re-randomization changes the proof points."""
    from zeth_tpu.zkp.groth16 import R1CS, prove, setup

    r = B.R
    r1cs = R1CS(n_wires=3, n_pub=1, constraints=[
        ({2: 1}, {2: 1}, {1: 1}),                 # x * x = out
    ])
    x = 99
    witness = [1, x * x % r, x]
    pk = setup(r1cs)
    p1 = prove(pk, r1cs, witness)
    p2 = prove(pk, r1cs, witness)
    verify(pk.vk, p1, [x * x % r])
    verify(pk.vk, p2, [x * x % r])
    assert p1.a != p2.a                           # blinded
