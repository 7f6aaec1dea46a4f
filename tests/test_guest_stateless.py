"""In-zkVM stateless-client guest: differential validation vs the host.

The guest (zeth_tpu/guest/stateless, the role of the reference's
guests/stateless-client) re-executes blocks inside the RV32IM zkVM and
commits the block hash; these tests feed it the same self-consistent
blocks the host EVM test-suite builds (tests/test_evm.py::_mk_block) and
require journal == block hash — i.e. guest EVM/trie/receipt semantics
match the host engine end-to-end."""

import sys

import pytest

sys.path.insert(0, "tests")

from zeth_tpu.app.guest_input import build_stateless_elf, encode_guest_input
from zeth_tpu.app.host import StatelessInput, validate_block
from zeth_tpu.app.chainspec import BY_CHAIN_ID
from zeth_tpu.executor import Executor


def run_guest_block(d, expect_hash):
    inp = StatelessInput.from_json(d)
    # the host validates it too (so a failure here means fixture trouble)
    assert validate_block(inp, BY_CHAIN_ID[1]) == expect_hash
    elf = build_stateless_elf()
    raw = encode_guest_input(inp, 1)
    res = Executor(elf, input_bytes=raw).run()
    assert res.exit_code == 0, \
        f"guest exit {res.exit_code}: {bytes(res.log)!r}"
    assert bytes(res.journal) == expect_hash
    return res


def test_guest_empty_block():
    from test_app import _fixture_input
    d, block = _fixture_input()
    res = run_guest_block(d, block.hash())
    assert res.user_cycles > 0


def test_guest_block_transfer_and_contract_call():
    from test_evm import CONTRACT, _mk_block, _signed_tx
    bob = b"\x44" * 20
    txs = [_signed_tx(0, bob, 10**15, b""),
           _signed_tx(1, CONTRACT, 0, b"\x00" * 4)]
    d, header, gas = _mk_block(txs)
    res = run_guest_block(d, header.hash())
    assert res.bigint_calls > 0          # sender recovery used SYS_BIGINT


def test_guest_block_reverted_tx():
    from test_evm import CONTRACT, _mk_block, _signed_tx
    # insufficient gas: the call reverts; block (status-0 receipt) is valid
    txs = [_signed_tx(0, CONTRACT, 0, (5).to_bytes(32, "big"), gas=22_000)]
    d, header, gas = _mk_block(txs)
    run_guest_block(d, header.hash())


def test_guest_block_precompiles():
    from test_evm import _mk_block, _signed_tx
    sha = b"\x00" * 19 + b"\x02"
    ident = b"\x00" * 19 + b"\x04"
    txs = [_signed_tx(0, sha, 0, b"abc"),
           _signed_tx(1, ident, 0, b"hello world")]
    d, header, gas = _mk_block(txs)
    run_guest_block(d, header.hash())
    assert gas > 42000


def test_guest_block_pairing_precompile():
    """A tx calling the bn254 pairing precompile (0x08) with the
    cancelling pair e(P,Q)*e(-P,Q): the guest must execute it in-zkVM
    (lib/bn254.c over SYS_BIGINT) and agree with the host engine's
    receipts/gas/post-state."""
    from test_evm import _mk_block, _signed_tx
    from zeth_tpu.app import bn254 as B
    pair_addr = b"\x00" * 19 + b"\x08"
    g1 = (1, 2)
    g2 = ((10857046999023057135944570762232829481370756359578518086990519993285655852781,
           11559732032986387107991004021392285783925812861821192530917403151452391805634),
          (8495653923123431417604973247489272438418190587263600148770280649306958101930,
           4082367875863433681332203403145435568316851327593401208105741076214120093531))
    def enc(p1, q2):
        (ax, ay), ((xr, xi), (yr, yi)) = p1, q2
        return b"".join(int(v).to_bytes(32, "big")
                        for v in (ax, ay, xi, xr, yi, yr))
    data = enc(g1, g2) + enc((1, B.P - 2), g2)
    txs = [_signed_tx(0, pair_addr, 0, data, gas=300_000)]
    d, header, gas = _mk_block(txs)
    run_guest_block(d, header.hash())
    assert gas > 45000 + 2 * 34000


def test_guest_block_create_contract():
    from test_evm import _mk_block, _signed_tx
    # initcode: PUSH1 4; PUSH1 12; PUSH0; CODECOPY; PUSH1 4; PUSH0; RETURN
    # runtime: PUSH0 PUSH0 REVERT STOP
    initcode = bytes.fromhex("6004600c5f395f60045ff3") + b"\x00" \
        + bytes.fromhex("5f5ffd00")
    txs = [_signed_tx(0, None, 0, initcode, gas=300_000)]
    d, header, gas = _mk_block(txs)
    run_guest_block(d, header.hash())


def test_guest_block_storage_and_logs():
    from test_evm import _mk_block, _signed_tx, CONTRACT
    # fixture contract: sstore(0, calldataload(0)), log1, return 42
    txs = [_signed_tx(0, CONTRACT, 5, (77).to_bytes(32, "big"))]
    d, header, gas = _mk_block(txs)
    run_guest_block(d, header.hash())


def test_guest_block_withdrawals():
    from test_evm import _mk_block
    w1 = (b"\x77" * 20, 123456)
    w2 = (b"\x88" * 20, 1)
    d, header, gas = _mk_block([], withdrawals=[w1, w2])
    run_guest_block(d, header.hash())


def test_guest_rejects_tampered_block():
    from test_evm import CONTRACT, _mk_block, _signed_tx
    txs = [_signed_tx(0, b"\x44" * 20, 10**15, b"")]
    d, header, gas = _mk_block(txs)
    bad = StatelessInput.from_json(d)
    bad.block.fields["gas_used"] = gas + 1
    elf = build_stateless_elf()
    raw = encode_guest_input(bad, 1)
    res = Executor(elf, input_bytes=raw).run()
    assert res.exit_code != 0
    assert b"gas used" in bytes(res.log)


import os


@pytest.mark.skipif(
    os.environ.get("ZETH_E2E", "0") != "1",
    reason="slow e2e (set ZETH_E2E=1): real multi-segment block proof")
def test_guest_block_real_proof():
    """BASELINE config 3 with real content: STARK-prove every segment of
    the stateless-client guest validating a block, verify the receipt
    against the guest image ID and the journal against the block hash."""
    from test_app import _fixture_input
    from zeth_tpu.app.host import BlockProcessor

    d, block = _fixture_input()
    proc = BlockProcessor.for_chain_id(1)
    assert "ZETH_DEV_MODE" not in os.environ or \
        os.environ["ZETH_DEV_MODE"] != "1"
    inp = StatelessInput.from_json(d)
    receipt = proc.prove(inp, segment_po2=14)
    receipt.verify(proc.image_id())
    assert receipt.journal == block.hash()


def test_guest_block_kzg_point_eval():
    """A tx calling the KZG point-evaluation precompile (0x0a): with a
    provisioned trusted setup the guest image embeds [tau]_2
    (kzg_setup.h) and verifies the proof in-zkVM over the 384-bit
    bigint accelerator, agreeing with the host engine."""
    import hashlib
    import sys
    sys.path.insert(0, "tests")
    from test_evm import _mk_block, _signed_tx
    from test_kzg import _commit_poly, _kzg_open
    from zeth_tpu.app import kzg

    tau = 0x7E57AA
    kzg.dev_setup(tau)
    try:
        coeffs = [9, 8, 7]
        z = 1234
        y, w = _kzg_open(coeffs, z, tau)
        c48 = kzg.g1_compress(_commit_poly(coeffs, tau))
        vh = bytes([1]) + hashlib.sha256(c48).digest()[1:]
        data = (vh + z.to_bytes(32, "big") + y.to_bytes(32, "big")
                + c48 + kzg.g1_compress(w))
        txs = [_signed_tx(0, b"\x00" * 19 + b"\x0a", 0, data, gas=200_000)]
        d, header, gas = _mk_block(txs)
        run_guest_block(d, header.hash())
        assert gas > 50000 + 21000
    finally:
        kzg._SETUP_G2 = None
        # restore the unprovisioned header so later builds are stable
        from zeth_tpu.app import guest_input
        guest_input._write_kzg_setup_header()
