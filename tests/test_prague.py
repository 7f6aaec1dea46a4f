"""Prague fork surface: EIP-7702 set-code txs, EIP-2537 BLS precompiles,
EIP-7623 calldata floor, EIP-2935 history call, EIP-7685 requests.

Builds a fully signed Prague block (type-4 tx with a live delegation,
a BLS pairing precompile call, a deposit-contract event, a calldata-floor
tx, and non-empty EIP-7002 withdrawal-request output), validates it
host-side, checks tamper rejection, and runs the same block through the
in-zkVM guest (differential). Mirrors the reference's reth 1.6.0 Prague
stateless validation (Cargo.toml:23-31)."""

import hashlib

import pytest

from test_evm import (COINBASE, PRIV_A, _address_of, _sign)

from zeth_tpu.app import rlp
from zeth_tpu.app.chainspec import MAINNET
from zeth_tpu.app.evm import logs_bloom, trie_root
from zeth_tpu.app.host import (CONSOLIDATION_REQUESTS_ADDRESS, Header,
                               StatelessInput, ValidationError,
                               WITHDRAWAL_REQUESTS_ADDRESS, validate_block,
                               _parse_deposit_log, run_block_txs)
from zeth_tpu.app.state import Account, SparseState
from zeth_tpu.app.trie import EMPTY_ROOT, Trie
from zeth_tpu.app.txs import Authorization, Tx
from zeth_tpu.hash.keccak import keccak256

TS_PRAGUE = 1_800_000_000          # past the mainnet Prague activation

# delegate target: SSTORE(0x42, 7), STOP
DELEGATE = b"\x44" * 20
DELEGATE_CODE = bytes.fromhex("6007604255 00".replace(" ", ""))

# EIP-7002 stand-in: returns 76 bytes of fixed request data
_WR_DATA = bytes(range(1, 77))
WITHDRAWAL_CODE = (bytes.fromhex("604c600c60003960 4c6000f3".replace(" ", ""))
                   + _WR_DATA)
# EIP-7251 stand-in: returns an empty queue
CONSOLIDATION_CODE = bytes.fromhex("60006000f3")


def _deposit_abi_payload() -> bytes:
    """Strict EIP-6110 DepositEvent ABI data (576 bytes)."""
    fields = [b"\xaa" * 48, b"\xbb" * 32, b"\xcc" * 8, b"\xdd" * 96,
              b"\xee" * 8]
    offs = [160, 256, 320, 384, 512]
    out = b"".join(o.to_bytes(32, "big") for o in offs)
    for f in fields:
        pad = (-len(f)) % 32
        out += len(f).to_bytes(32, "big") + f + b"\x00" * pad
    return out


DEPOSIT_TOPIC = keccak256(b"DepositEvent(bytes,bytes,bytes,bytes,bytes)")


def _deposit_emitter_code() -> bytes:
    data = _deposit_abi_payload()
    assert len(data) == 576
    prefix = (b"\x61\x02\x40"              # PUSH2 576
              b"\x61\x00\x31"              # PUSH2 data_off (49)
              b"\x60\x00"                  # PUSH1 0
              b"\x39"                      # CODECOPY
              b"\x7f" + DEPOSIT_TOPIC +    # PUSH32 topic
              b"\x61\x02\x40"              # PUSH2 576
              b"\x60\x00"                  # PUSH1 0
              b"\xa1"                      # LOG1
              b"\x00")                     # STOP
    assert len(prefix) == 49
    return prefix + data


# BLS12-381 generator points in EIP-2537 wire encoding
def _enc_fp(v: int) -> bytes:
    return v.to_bytes(64, "big")


def _pairing_calldata() -> bytes:
    from zeth_tpu.app import bls12381 as B
    g1 = B.G1_GEN
    g2 = B.G2_GEN
    neg_g1 = (g1[0], B.P - g1[1])
    enc_g2 = (_enc_fp(g2[0][0]) + _enc_fp(g2[0][1])
              + _enc_fp(g2[1][0]) + _enc_fp(g2[1][1]))
    return (_enc_fp(g1[0]) + _enc_fp(g1[1]) + enc_g2
            + _enc_fp(neg_g1[0]) + _enc_fp(neg_g1[1]) + enc_g2)


def _signed(tx: Tx) -> Tx:
    h, _ = tx.signing_hash()
    r, s, rec = _sign(h, PRIV_A)
    tx.v, tx.r, tx.s = rec, r, s
    return tx


def _signed_auth(address: bytes, nonce: int, chain_id: int = 1):
    a = Authorization(chain_id=chain_id, address=address, nonce=nonce,
                      y_parity=0, r=0, s=0)
    r, s, rec = _sign(a.signing_hash(), PRIV_A)
    a.y_parity, a.r, a.s = rec, r, s
    return a


def _pre_state():
    alice = _address_of(PRIV_A)
    t = Trie()
    t.insert(keccak256(alice),
             Account(0, 10**18, EMPTY_ROOT, keccak256(b"")).encode())
    codes = []
    for addr, code in [
            (DELEGATE, DELEGATE_CODE),
            (WITHDRAWAL_REQUESTS_ADDRESS, WITHDRAWAL_CODE),
            (CONSOLIDATION_REQUESTS_ADDRESS, CONSOLIDATION_CODE),
            (MAINNET.deposit_contract, _deposit_emitter_code())]:
        t.insert(keccak256(addr),
                 Account(1, 0, EMPTY_ROOT, keccak256(code)).encode())
        codes.append(code)
    return t, alice, codes


def _prague_txs(alice):
    txs = []
    # 1. self-sponsored type-4: delegate alice's EOA to DELEGATE, then
    #    call alice herself so the delegated code runs in her context
    #    (auth nonce 1 = alice's nonce after the sender bump)
    txs.append(_signed(Tx(
        type=4, nonce=0, gas_limit=120_000, to=alice, value=0, data=b"",
        v=0, r=0, s=0, chain_id=1, max_fee=100, max_priority_fee=3,
        authorization_list=[_signed_auth(DELEGATE, 1)])))
    # 2. BLS pairing precompile: e(G1, G2) * e(-G1, G2) == 1
    txs.append(_signed(Tx(
        type=2, nonce=2, gas_limit=400_000, to=b"\x00" * 19 + b"\x0f",
        value=0, data=_pairing_calldata(), v=0, r=0, s=0, chain_id=1,
        max_fee=100, max_priority_fee=3)))
    # 3. deposit-contract call -> DepositEvent -> type-0 request
    txs.append(_signed(Tx(
        type=2, nonce=3, gas_limit=200_000, to=MAINNET.deposit_contract,
        value=0, data=b"", v=0, r=0, s=0, chain_id=1, max_fee=100,
        max_priority_fee=3)))
    # 4. EIP-7623: 2000 zero calldata bytes to an EOA -> floor binds
    #    (floor 41000 > 21000 + 4*2000 = 29000)
    txs.append(_signed(Tx(
        type=2, nonce=4, gas_limit=60_000, to=b"\x77" * 20, value=1,
        data=b"\x00" * 2000, v=0, r=0, s=0, chain_id=1, max_fee=100,
        max_priority_fee=3)))
    return txs


def _tx_json(tx: Tx):
    d = {
        "type": hex(tx.type), "nonce": hex(tx.nonce),
        "gas": hex(tx.gas_limit),
        "to": "0x" + tx.to.hex() if tx.to else None,
        "value": hex(tx.value), "input": "0x" + tx.data.hex(),
        "chainId": hex(tx.chain_id),
        "maxFeePerGas": hex(tx.max_fee),
        "maxPriorityFeePerGas": hex(tx.max_priority_fee),
        "accessList": [],
        "v": hex(tx.v), "r": hex(tx.r), "s": hex(tx.s),
    }
    if tx.type == 4:
        d["authorizationList"] = [{
            "chainId": hex(a.chain_id), "address": "0x" + a.address.hex(),
            "nonce": hex(a.nonce), "yParity": hex(a.y_parity),
            "r": hex(a.r), "s": hex(a.s)} for a in tx.authorization_list]
    return d


def make_prague_block():
    """Build the self-consistent Prague block + witness JSON."""
    t, alice, codes = _pre_state()
    pre_root = t.root_hash()
    txs = _prague_txs(alice)

    state = SparseState(pre_root, t.rlp_nodes(), codes)
    env_header = Header({
        "parent_hash": b"\x11" * 32, "beneficiary": COINBASE,
        "number": 101, "gas_limit": 30_000_000,
        "timestamp": TS_PRAGUE, "mix_hash": b"\x00" * 32,
        "base_fee_per_gas": 7, "excess_blob_gas": 0,
        "state_root": b"\x00" * 32,
    })
    be, cumulative, receipts, all_logs, blob_gas, requests_hash = \
        run_block_txs(env_header, txs, [], MAINNET, state, {})
    assert requests_hash is not None
    diff = be.state_diff()
    state.codes.update(be.new_code())
    post_root = state.calculate_state_root(diff)

    parent = Header({
        "parent_hash": b"\x11" * 32,
        "ommers_hash": keccak256(rlp.encode([])),
        "beneficiary": COINBASE, "state_root": pre_root,
        "transactions_root": EMPTY_ROOT, "receipts_root": EMPTY_ROOT,
        "logs_bloom": b"\x00" * 256, "difficulty": 0, "number": 100,
        "gas_limit": 30_000_000, "gas_used": 0,
        "timestamp": TS_PRAGUE - 12, "extra_data": b"",
        "mix_hash": b"\x00" * 32, "nonce": b"\x00" * 8,
        "base_fee_per_gas": 7, "withdrawals_root": EMPTY_ROOT,
        "blob_gas_used": 0, "excess_blob_gas": 0,
        "parent_beacon_block_root": b"\x00" * 32,
        "requests_hash": hashlib.sha256(b"").digest(),
    })
    header = Header(dict(parent.fields))
    header.fields.update({
        "parent_hash": parent.hash(), "number": 101,
        "timestamp": TS_PRAGUE, "state_root": post_root,
        "transactions_root": trie_root([tx.encode() for tx in txs]),
        "receipts_root": trie_root(receipts),
        "logs_bloom": logs_bloom(all_logs),
        "gas_used": cumulative,
        "requests_hash": requests_hash,
    })
    hj = {k: (v if isinstance(v, int) else "0x" + v.hex())
          for k, v in header.fields.items()}
    d = {"block": {"header": hj,
                   "body": {"transactions": [_tx_json(tx) for tx in txs],
                            "withdrawals": []}},
         "witness": {"state": ["0x" + n.hex()
                               for n in _pre_state()[0].rlp_nodes()],
                     "codes": ["0x" + c.hex() for c in codes],
                     "headers": ["0x" + parent.encode().hex()]}}
    return d, header, txs, alice


def test_prague_block_validates():
    d, header, txs, alice = make_prague_block()
    inp = StatelessInput.from_json(d)
    assert validate_block(inp, MAINNET) == header.hash()


def test_prague_delegation_applied():
    d, header, txs, alice = make_prague_block()
    inp = StatelessInput.from_json(d)
    t, _, codes = _pre_state()
    state = SparseState(t.root_hash(), t.rlp_nodes(), codes)
    be, *_ = run_block_txs(header, [Tx.from_json(x) for x in
                                    d["block"]["body"]["transactions"]],
                           [], MAINNET, state, {})
    diff = be.state_diff()
    # alice's account now carries the delegation designator and the
    # delegated SSTORE(0x42, 7) landed in HER storage
    fields, slots = diff[alice]
    assert fields["code_hash"] == keccak256(b"\xef\x01\x00" + DELEGATE)
    assert slots[(0x42).to_bytes(32, "big")] == 7
    # nonce: 4 sender bumps (txs 0..3) + 1 authorization bump
    assert fields["nonce"] == 5


def test_prague_floor_gas_binds():
    d, header, txs, alice = make_prague_block()
    # tx 4: 2000 zero bytes -> floor = 21000 + 10*2000 = 41000
    t, _, codes = _pre_state()
    state = SparseState(t.root_hash(), t.rlp_nodes(), codes)
    be, cumulative, receipts, logs, bg, rh = run_block_txs(
        header, txs, [], MAINNET, state, {})
    import zeth_tpu.app.rlp as _r
    # cumulative deltas from receipts: last tx's gas
    prev = _r.decode_full(receipts[-2][1:])
    last = _r.decode_full(receipts[-1][1:])
    gas_last = int.from_bytes(last[1], "big") - int.from_bytes(prev[1], "big")
    assert gas_last == 41000


def test_prague_requests_hash_tamper_rejected():
    d, header, txs, alice = make_prague_block()
    hj = d["block"]["header"]
    bad = bytearray(bytes.fromhex(hj["requests_hash"][2:]))
    bad[0] ^= 1
    hj["requests_hash"] = "0x" + bytes(bad).hex()
    inp = StatelessInput.from_json(d)
    with pytest.raises(ValidationError):
        validate_block(inp, MAINNET)


def test_parse_deposit_log_strictness():
    good = _deposit_abi_payload()
    out = _parse_deposit_log(good)
    assert len(out) == 192
    bad = bytearray(good)
    bad[31] ^= 1                       # wrong first offset
    with pytest.raises(ValidationError):
        _parse_deposit_log(bytes(bad))


def test_eip2537_dispatch_vectors():
    from zeth_tpu.app import bls12381 as B
    g = B.G1_GEN
    # G + G == 2G
    data = _enc_fp(g[0]) + _enc_fp(g[1]) + _enc_fp(g[0]) + _enc_fp(g[1])
    out = B.eip2537_dispatch(0, data)
    dbl = B.g1_mul(g, 2)
    assert out == _enc_fp(dbl[0]) + _enc_fp(dbl[1])
    # MSM: 3 * G
    k = (3).to_bytes(32, "big")
    out = B.eip2537_dispatch(1, _enc_fp(g[0]) + _enc_fp(g[1]) + k)
    trip = B.g1_mul(g, 3)
    assert out == _enc_fp(trip[0]) + _enc_fp(trip[1])
    # pairing: e(G1, G2) * e(-G1, G2) == 1
    assert B.eip2537_dispatch(4, _pairing_calldata()) == \
        (1).to_bytes(32, "big")
    # off-curve point rejected
    bad = bytearray(data)
    bad[127] ^= 1
    with pytest.raises(ValueError):
        B.eip2537_dispatch(0, bytes(bad))


def test_authorization_recovery_roundtrip():
    a = _signed_auth(DELEGATE, 5)
    assert a.authority() == _address_of(PRIV_A)


def test_guest_prague_differential():
    """The same Prague block validates inside the zkVM guest."""
    from test_guest_stateless import run_guest_block
    d, header, txs, alice = make_prague_block()
    run_guest_block(d, header.hash())


def test_eip2537_g2_vectors():
    from zeth_tpu.app import bls12381 as B
    g2 = B.G2_GEN
    enc = (_enc_fp(g2[0][0]) + _enc_fp(g2[0][1])
           + _enc_fp(g2[1][0]) + _enc_fp(g2[1][1]))
    out = B.eip2537_dispatch(2, enc + enc)           # G2 + G2 == 2*G2
    dbl = B.g2_mul(g2, 2)
    assert out == (_enc_fp(dbl[0][0]) + _enc_fp(dbl[0][1])
                   + _enc_fp(dbl[1][0]) + _enc_fp(dbl[1][1]))
    out2 = B.eip2537_dispatch(3, enc + (2).to_bytes(32, "big"))  # MSM 2*G2
    assert out2 == out
    # infinity encodings round-trip
    assert B.eip2537_dispatch(2, b"\x00" * 256 + enc) == enc
