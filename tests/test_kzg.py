"""BLS12-381 pairing + EIP-4844 KZG point-evaluation precompile (0x0a).

The trusted setup is a locally generated tau (kzg.dev_setup) — the
verification algebra is identical to mainnet's; only the ceremony
constant differs (provisioned via ZETH_KZG_SETUP_G2 in production).
"""

import hashlib

import pytest

from zeth_tpu.app import bls12381 as B
from zeth_tpu.app import kzg


def test_bls_generators_and_bilinearity():
    assert B.g1_valid(B.G1_GEN) and B.g1_in_subgroup(B.G1_GEN)
    assert B.g2_valid(B.G2_GEN) and B.g2_in_subgroup(B.G2_GEN)
    e = B.pairing(B.G2_GEN, B.G1_GEN)
    assert e != B.F12_ONE
    assert B.f12_pow(e, B.R) == B.F12_ONE
    assert B.pairing(B.G2_GEN, B.g1_mul(B.G1_GEN, 7)) == B.f12_pow(e, 7)
    assert B.pairing(B.g2_mul(B.G2_GEN, 7), B.G1_GEN) == B.f12_pow(e, 7)


def test_bls_pairing_product():
    a, b = 11, 23
    assert B.pairing_check([
        (B.g1_mul(B.G1_GEN, a), B.g2_mul(B.G2_GEN, b)),
        (B.g1_mul(B.G1_GEN, a * b), B.g2_neg(B.G2_GEN))])
    assert not B.pairing_check([
        (B.g1_mul(B.G1_GEN, a), B.g2_mul(B.G2_GEN, b)),
        (B.g1_mul(B.G1_GEN, a * b + 1), B.g2_neg(B.G2_GEN))])


def test_g1_compress_roundtrip():
    for k in (1, 2, 12345, B.R - 1):
        pt = B.g1_mul(B.G1_GEN, k)
        back = B.g1_decompress(kzg.g1_compress(pt))
        assert back == pt
    assert B.g1_decompress(kzg.g1_compress(None)) is None
    with pytest.raises(ValueError):
        B.g1_decompress(b"\x00" * 48)          # c_flag clear
    # x not on the curve
    bad = bytearray(kzg.g1_compress(B.G1_GEN))
    bad[47] ^= 1
    with pytest.raises(ValueError):
        B.g1_decompress(bytes(bad))


def _commit_poly(coeffs, tau):
    """[P(tau)]_1 for coefficient-form P (test-side, knows tau)."""
    v = 0
    tp = 1
    for c in coeffs:
        v = (v + c * tp) % B.R
        tp = tp * tau % B.R
    return B.g1_mul(B.G1_GEN, v)


def _kzg_open(coeffs, z, tau):
    """(y, proof): P(z) and [Q(tau)]_1 with Q = (P - y)/(X - z)."""
    r = B.R
    y = 0
    zp = 1
    for c in coeffs:
        y = (y + c * zp) % r
        zp = zp * z % r
    # synthetic division by (X - z)
    q = [0] * (len(coeffs) - 1)
    carry = 0
    for i in range(len(coeffs) - 1, 0, -1):
        carry = (coeffs[i] + carry * z) % r
        q[i - 1] = carry
    return y, _commit_poly(q, tau)


@pytest.fixture()
def dev_tau():
    tau = 0x1BEEF00D5EED
    kzg.dev_setup(tau)
    yield tau
    kzg._SETUP_G2 = None


def test_verify_kzg_proof(dev_tau):
    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    z = 0xABCDEF
    y, w = _kzg_open(coeffs, z, dev_tau)
    c48 = kzg.g1_compress(_commit_poly(coeffs, dev_tau))
    w48 = kzg.g1_compress(w)
    assert kzg.verify_kzg_proof(c48, z, y, w48)
    assert not kzg.verify_kzg_proof(c48, z, (y + 1) % B.R, w48)
    assert not kzg.verify_kzg_proof(c48, (z + 1) % B.R, y, w48)


def test_point_evaluation_precompile_body(dev_tau):
    coeffs = [7, 7, 7, 1]
    z = 0x1234
    y, w = _kzg_open(coeffs, z, dev_tau)
    c48 = kzg.g1_compress(_commit_poly(coeffs, dev_tau))
    vh = bytes([1]) + hashlib.sha256(c48).digest()[1:]
    inp = (vh + z.to_bytes(32, "big") + y.to_bytes(32, "big")
           + c48 + kzg.g1_compress(w))
    out = kzg.point_evaluation(inp)
    assert out == kzg.PRECOMPILE_OUTPUT
    assert int.from_bytes(out[:32], "big") == 4096
    assert int.from_bytes(out[32:], "big") == B.R
    with pytest.raises(kzg.KzgError):
        kzg.point_evaluation(b"\x00" + inp[1:])    # bad versioned hash
    with pytest.raises(kzg.KzgError):
        kzg.point_evaluation(inp[:-1])             # bad length


def test_point_evaluation_requires_setup():
    kzg._SETUP_G2 = None
    import os
    assert "ZETH_KZG_SETUP_G2" not in os.environ
    with pytest.raises(kzg.KzgError, match="not provisioned"):
        kzg.verify_kzg_proof(kzg.g1_compress(B.G1_GEN), 1, 1,
                             kzg.g1_compress(B.G1_GEN))


def test_setup_g2_roundtrip_compressed(dev_tau):
    """The provisioning path accepts the ceremony wire format."""
    pt = kzg._SETUP_G2
    # compress: x_c1 || x_c0, flags on byte 0
    x, yv = pt
    data = bytearray(x[1].to_bytes(48, "big") + x[0].to_bytes(48, "big"))
    data[0] |= 0x80
    if kzg._f2_lex_gt_neg(yv):
        data[0] |= 0x20
    back = kzg.g2_decompress(bytes(data))
    assert back == pt


def test_kzg_precompile_in_evm(dev_tau):
    from zeth_tpu.app.evm import BlockEvm
    from zeth_tpu.app.state import Account, EMPTY_CODE_HASH, SparseState
    from zeth_tpu.app.trie import EMPTY_ROOT, Trie
    from zeth_tpu.hash.keccak import keccak256

    coeffs = [5, 0, 2]
    z = 99
    y, w = _kzg_open(coeffs, z, dev_tau)
    c48 = kzg.g1_compress(_commit_poly(coeffs, dev_tau))
    vh = bytes([1]) + hashlib.sha256(c48).digest()[1:]
    data = (vh + z.to_bytes(32, "big") + y.to_bytes(32, "big")
            + c48 + kzg.g1_compress(w))

    alice = b"\xaa" * 20
    t = Trie()
    t.insert(keccak256(alice),
             Account(0, 10**18, EMPTY_ROOT, EMPTY_CODE_HASH).encode())
    state = SparseState(t.root_hash(), t.rlp_nodes())
    be = BlockEvm(state, {})
    be.set_block(coinbase=b"\x33" * 20, number=1, timestamp=1,
                 gas_limit=10**7, basefee=0, prevrandao=b"\x00" * 32,
                 blob_basefee=0, chain_id=1)
    res = be.exec_tx(sender=alice, to=b"\x00" * 19 + b"\x0a", value=0,
                     gas_limit=200_000, eff_gas_price=0, tip_per_gas=0,
                     data=data, nonce=0)
    assert res.status == 1
    assert res.gas_used >= 50000 + 21000
    # an invalid proof makes the precompile (and the call) fail
    bad = bytearray(data)
    bad[95] ^= 1                                   # y += 1
    res2 = be.exec_tx(sender=alice, to=b"\x00" * 19 + b"\x0a", value=0,
                      gas_limit=200_000, eff_gas_price=0, tip_per_gas=0,
                      data=bytes(bad), nonce=1)
    assert res2.status == 0
