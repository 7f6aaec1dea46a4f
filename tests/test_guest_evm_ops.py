"""Guest EVM opcode/edge-case differential suite.

Builds self-consistent blocks around hand-written bytecode that sweeps
the interpreter's corners (arithmetic edges, memory ops, storage
refunds, call varieties, CREATE2, EIP-6780 selfdestruct, precompiles,
revert-with-data) and requires the in-zkVM guest to reproduce the
host engine's post-execution commitments exactly (journal == hash).
"""

import sys

import pytest

sys.path.insert(0, "tests")

from test_evm import (COINBASE, PRIV_A, _address_of, _sign)
from zeth_tpu.app.evm import BlockEvm, encode_receipt, logs_bloom, trie_root
from zeth_tpu.app.guest_input import build_stateless_elf, encode_guest_input
from zeth_tpu.app.host import (Header, StatelessInput, validate_block)
from zeth_tpu.app.chainspec import BY_CHAIN_ID
from zeth_tpu.app.state import Account, SparseState
from zeth_tpu.app.trie import EMPTY_ROOT, Trie
from zeth_tpu.app import rlp
from zeth_tpu.app.txs import Tx
from zeth_tpu.executor import Executor
from zeth_tpu.hash.keccak import keccak256

EMPTY_CODE_HASH = keccak256(b"")
ALICE = _address_of(PRIV_A)


def push(v: int) -> bytes:
    if v == 0:
        return b"\x5f"
    b = v.to_bytes((v.bit_length() + 7) // 8, "big")
    return bytes([0x5F + len(b)]) + b


def mstore(off, v):
    return push(v) + push(off) + b"\x52"


def ret(off, ln):
    return push(ln) + push(off) + b"\xf3"


def sstore(k, v):
    return push(v) + push(k) + b"\x55"


def log_result(op: bytes, n_pops=1) -> bytes:
    """Run `op` (leaves one stack value), store it, log1 it."""
    return op + b"\x5f\x52" + push(32) + push(0) + push(0xEE) + b"\xa1"


class BlockBuilder:
    """Generalized _mk_block: arbitrary pre-state accounts + txs."""

    def __init__(self):
        self.trie = Trie()
        self.codes = []
        self.storage_nodes = []

    def add_account(self, addr, balance=0, nonce=0, code=b"", storage=None):
        from zeth_tpu.app.trie import _encode

        st = Trie()
        for k, v in (storage or {}).items():
            st.insert(keccak256(int(k).to_bytes(32, "big")),
                      rlp.encode(int(v)))
        if storage:
            self.storage_nodes += st.rlp_nodes()
            root_enc = _encode(st.root)
            if len(root_enc) < 32 or root_enc not in self.storage_nodes:
                self.storage_nodes.append(root_enc)
        ch = keccak256(code) if code else EMPTY_CODE_HASH
        if code:
            self.codes.append(code)
        self.trie.insert(
            keccak256(addr),
            Account(nonce, balance, st.root_hash(), ch).encode())

    def signed_tx(self, nonce, to, value=0, data=b"", gas=500_000,
                  tx_type=2, acl=()):
        tx = Tx(type=tx_type, nonce=nonce, gas_limit=gas, to=to, value=value,
                data=data, v=0, r=0, s=0, chain_id=1,
                gas_price=100 if tx_type < 2 else None,
                max_fee=100 if tx_type >= 2 else None,
                max_priority_fee=3 if tx_type >= 2 else None,
                access_list=list(acl))
        if tx_type == 0:
            tx.v = 35 + 2 * 1             # EIP-155 preimage (chain 1)
        h, _ = tx.signing_hash()
        r, s, rec = _sign(h, PRIV_A)
        if tx_type == 0:
            tx.v = 35 + 2 * 1 + rec
        else:
            tx.v = rec
        tx.r, tx.s = r, s
        return tx

    def build(self, txs, withdrawals=()):
        pre_root = self.trie.root_hash()
        nodes = self.trie.rlp_nodes() + self.storage_nodes
        state = SparseState(pre_root, nodes, self.codes)
        be = BlockEvm(state, {})
        be.set_block(coinbase=COINBASE, number=101,
                     timestamp=1_740_000_000, gas_limit=30_000_000,
                     basefee=7, prevrandao=b"\x00" * 32, blob_basefee=0,
                     chain_id=1)
        cumulative = 0
        receipts = []
        all_logs = []
        for tx in txs:
            eff, tip = tx.effective_gas_price(7)
            res = be.exec_tx(sender=tx.sender(), to=tx.to, value=tx.value,
                             gas_limit=tx.gas_limit, eff_gas_price=eff,
                             tip_per_gas=tip, data=tx.data,
                             access_list=tx.access_list, nonce=tx.nonce)
            cumulative += res.gas_used
            receipts.append(encode_receipt(tx.type, res.status, cumulative,
                                           res.logs))
            all_logs += res.logs
        for addr, gwei in withdrawals:
            be.add_balance(addr, gwei * 10**9)
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
            "timestamp": 1_739_999_988, "extra_data": b"",
            "mix_hash": b"\x00" * 32, "nonce": b"\x00" * 8,
            "base_fee_per_gas": 7, "withdrawals_root": EMPTY_ROOT,
            "blob_gas_used": 0, "excess_blob_gas": 0,
            "parent_beacon_block_root": b"\x00" * 32,
        })
        header = Header(dict(parent.fields))
        header.fields.update({
            "parent_hash": parent.hash(), "number": 101,
            "timestamp": 1_740_000_000, "state_root": post_root,
            "transactions_root": trie_root([tx.encode() for tx in txs]),
            "receipts_root": trie_root(receipts),
            "logs_bloom": logs_bloom(all_logs),
            "gas_used": cumulative,
        })

        def _tx_json(tx):
            d = {"type": hex(tx.type), "nonce": hex(tx.nonce),
                 "gas": hex(tx.gas_limit),
                 "to": "0x" + tx.to.hex() if tx.to else None,
                 "value": hex(tx.value), "input": "0x" + tx.data.hex(),
                 "v": hex(tx.v), "r": hex(tx.r), "s": hex(tx.s)}
            if tx.type == 0:
                d["gasPrice"] = hex(tx.gas_price)
            else:
                d["chainId"] = hex(tx.chain_id)
                d["accessList"] = [
                    {"address": "0x" + a.hex(),
                     "storageKeys": ["0x" + k.hex() for k in ks]}
                    for a, ks in tx.access_list]
                if tx.type == 1:
                    d["gasPrice"] = hex(tx.gas_price)
                else:
                    d["maxFeePerGas"] = hex(tx.max_fee)
                    d["maxPriorityFeePerGas"] = hex(tx.max_priority_fee)
            return d

        hj = {k: (v if isinstance(v, int) else "0x" + v.hex())
              for k, v in header.fields.items()}
        wd_json = [{"address": "0x" + a.hex(), "amount": hex(g)}
                   for a, g in withdrawals]
        d = {"block": {"header": hj,
                       "body": {"transactions": [_tx_json(t) for t in txs],
                                "withdrawals": wd_json}},
             "witness": {"state": ["0x" + n.hex() for n in nodes],
                         "codes": ["0x" + c.hex() for c in self.codes],
                         "headers": ["0x" + parent.encode().hex()]}}
        return d, header, cumulative


def check_guest(d, header):
    inp = StatelessInput.from_json(d)
    assert validate_block(inp, BY_CHAIN_ID[1]) == header.hash()
    elf = build_stateless_elf()
    res = Executor(elf, input_bytes=encode_guest_input(inp, 1)).run()
    assert res.exit_code == 0, \
        f"guest exit {res.exit_code}: {bytes(res.log)!r}"
    assert bytes(res.journal) == header.hash()
    return res


CONTRACT_A = b"\x2a" * 20


def _block_with_code(code, calldata=b"", value=0, n_txs=1, gas=2_000_000):
    bb = BlockBuilder()
    bb.add_account(ALICE, balance=10**18)
    bb.add_account(CONTRACT_A, balance=10**15, nonce=1, code=code,
                   storage={1: 0xAA, 2: 0xBB})
    txs = [bb.signed_tx(i, CONTRACT_A, value=value, data=calldata, gas=gas)
           for i in range(n_txs)]
    return bb.build(txs)


def test_arithmetic_edge_sweep():
    # chained ops over edge constants, result accumulated into storage
    neg1 = (1 << 256) - 1
    int_min = 1 << 255
    ops = b""
    # SDIV INT_MIN / -1 (overflow case -> INT_MIN)
    ops += push(neg1) + push(int_min) + b"\x05"
    # SMOD -7 % 3 -> -1
    ops += push(3) + push((-7) % (1 << 256)) + b"\x07" + b"\x01"
    # ADDMOD (max, max, 7); MULMOD (max, max, 9)
    ops += push(7) + push(neg1) + push(neg1) + b"\x08" + b"\x01"
    ops += push(9) + push(neg1) + push(neg1) + b"\x09" + b"\x01"
    # EXP 3^61; SIGNEXTEND(0, 0x80) -> sign-extended
    ops += push(61) + push(3) + b"\x0a" + b"\x01"
    ops += push(0x80) + push(0) + b"\x0b" + b"\x01"
    # SAR on negative; BYTE 31; SHL/SHR edges (shift 255, 256)
    ops += push(3) + push(int_min) + b"\x1d" + b"\x01"
    ops += push(0xCAFE) + push(31) + b"\x1a" + b"\x01"
    ops += push(1) + push(255) + b"\x1b" + b"\x01"
    ops += push(neg1) + push(256) + b"\x1c" + b"\x01"
    # DIV/MOD by zero
    ops += push(0) + push(12345) + b"\x04" + b"\x01"
    ops += push(0) + push(12345) + b"\x06" + b"\x01"
    code = ops + sstore(7, 0) + b"\x5f\x55"[:0]  # keep stack value
    code = ops + push(7) + b"\x55" + ret(0, 0)   # sstore(7, acc)
    d, header, gas = _block_with_code(code)
    check_guest(d, header)


def test_memory_ops_and_keccak():
    code = (mstore(0, 0xDEADBEEF) +
            push(0xAB) + push(100) + b"\x53" +          # MSTORE8
            push(64) + push(0) + push(200) + b"\x5e" +  # MCOPY
            b"\x59" +                                   # MSIZE
            push(0) + b"\x55" +                         # sstore(0, msize)
            push(300) + push(0) + b"\x20" +             # KECCAK256(0,300)
            push(1) + b"\x55" +                         # sstore(1, hash)
            ret(0, 64))
    d, header, gas = _block_with_code(code)
    check_guest(d, header)


def test_storage_refund_paths():
    # clear a pre-set slot (refund), set-then-clear (net new), restore orig
    code = (sstore(1, 0) +           # orig AA -> 0: 4800 refund
            sstore(5, 77) +          # fresh set: 20000
            sstore(5, 0) +           # same-tx clear: 19900 refund
            sstore(2, 0xBB) +        # no-op write (orig BB -> BB)
            ret(0, 0))
    d, header, gas = _block_with_code(code)
    check_guest(d, header)


def test_calls_and_returndata():
    # B: returns 32 bytes of calldata doubled
    code_b = (push(0) + b"\x35" +       # calldataload(0)
              b"\x80\x01" +             # dup add (double)
              mstore(0, 0)[:0] + b"\x5f\x52" + ret(0, 32))
    addr_b = b"\x2b" * 20
    # A: CALL B, then DELEGATECALL B, then STATICCALL B; store rdata
    call = (push(32) + push(0) + push(32) + push(0) + push(0)
            + push(int.from_bytes(addr_b, "big")) + push(50000) + b"\xf1")
    dcall = (push(32) + push(0) + push(32) + push(0)
             + push(int.from_bytes(addr_b, "big")) + push(50000) + b"\xf4")
    scall = (push(32) + push(0) + push(32) + push(0)
             + push(int.from_bytes(addr_b, "big")) + push(50000) + b"\xfa")
    code_a = (mstore(0, 21) + call + push(3) + b"\x55"
              + push(0) + b"\x51" + push(4) + b"\x55"    # stored result
              + mstore(0, 30) + dcall + push(5) + b"\x55"
              + push(0) + b"\x51" + push(6) + b"\x55"
              + mstore(0, 40) + scall + push(7) + b"\x55"
              + b"\x3d" + push(8) + b"\x55"              # returndatasize
              + ret(0, 0))
    bb = BlockBuilder()
    bb.add_account(ALICE, balance=10**18)
    bb.add_account(CONTRACT_A, balance=10**15, nonce=1, code=code_a)
    bb.add_account(addr_b, nonce=1, code=code_b)
    d, header, gas = bb.build([bb.signed_tx(0, CONTRACT_A, gas=500_000)])
    check_guest(d, header)


def test_create2_and_eip6780_selfdestruct():
    # initcode: runtime = [CALLER SELFDESTRUCT] (created then destroyed
    # in the SAME tx -> vanishes, EIP-6780)
    runtime = b"\x33\xff"
    initcode = (push(int.from_bytes(runtime, "big"))
                + push(0) + b"\x52"
                + ret(32 - len(runtime), len(runtime)))
    # A: CREATE2(value=1, initcode), then CALL the new address
    store_init = b""
    off = 0
    for i in range(0, len(initcode), 32):
        chunk = initcode[i:i + 32].ljust(32, b"\x00")
        store_init += mstore(off, int.from_bytes(chunk, "big"))
        off += 32
    code_a = (store_init
              + push(0x5A17) + push(len(initcode)) + push(0) + push(1)
              + b"\xf5"                                  # CREATE2
              + b"\x80" + push(1) + b"\x55"              # sstore(1, addr)
              + push(0) + push(0) + push(0) + push(0) + push(0)
              + b"\x86"                                  # dup7: addr
              + push(80000) + b"\xf1"                    # CALL -> selfdestruct
              + push(2) + b"\x55"
              + ret(0, 0))
    bb = BlockBuilder()
    bb.add_account(ALICE, balance=10**18)
    bb.add_account(CONTRACT_A, balance=10**15, nonce=1, code=code_a)
    d, header, gas = bb.build([bb.signed_tx(0, CONTRACT_A, gas=900_000)])
    check_guest(d, header)


def test_precompiles_modexp_bn_blake_ripemd():
    def call_pre(addr_id, data_len, out_len):
        return (push(out_len) + push(0) + push(data_len) + push(0)
                + push(0) + push(addr_id) + push(200000) + b"\xf1"
                + push(100 + addr_id) + b"\x55")
    # modexp 3^5 mod 7: lens 1,1,1 + values
    modexp_in = (mstore(0, 1) + mstore(32, 1) + mstore(64, 1)
                 + push(0x030507) + push(99) + b"\x52")  # bytes 96..98
    code = (modexp_in + call_pre(0x05, 99, 32)
            + push(0) + b"\x51" + push(1) + b"\x55"      # result word
            # bn add: (1,2) + (1,2)
            + mstore(0, 1) + mstore(32, 2) + mstore(64, 1) + mstore(96, 2)
            + call_pre(0x06, 128, 64)
            + push(0) + b"\x51" + push(2) + b"\x55"
            # bn mul: (1,2) * 9
            + mstore(0, 1) + mstore(32, 2) + mstore(64, 9)
            + call_pre(0x07, 96, 64)
            + push(0) + b"\x51" + push(3) + b"\x55"
            # ripemd160("") via 0x03 with empty input
            + call_pre(0x03, 0, 32)
            + push(0) + b"\x51" + push(4) + b"\x55"
            + ret(0, 0))
    d, header, gas = _block_with_code(code, gas=2_000_000)
    check_guest(d, header)


def test_revert_with_data_and_nested_revert():
    # B: sstore then revert with 5 bytes
    code_b = (sstore(9, 1234) + mstore(0, 0xAABBCCDD11)
              + push(5) + push(27) + b"\xfd")
    addr_b = b"\x2c" * 20
    call = (push(32) + push(0) + push(0) + push(0) + push(0)
            + push(int.from_bytes(addr_b, "big")) + push(90000) + b"\xf1")
    code_a = (call + push(1) + b"\x55"          # success flag (0)
              + b"\x3d" + push(2) + b"\x55"     # returndatasize (5)
              + push(0) + b"\x51" + push(3) + b"\x55"  # copied rdata word
              + sstore(4, 42) + ret(0, 0))
    bb = BlockBuilder()
    bb.add_account(ALICE, balance=10**18)
    bb.add_account(CONTRACT_A, balance=10**15, nonce=1, code=code_a)
    bb.add_account(addr_b, nonce=1, code=code_b)
    d, header, gas = bb.build([bb.signed_tx(0, CONTRACT_A, gas=400_000)])
    check_guest(d, header)


def test_access_list_tx_and_legacy_tx():
    code = sstore(1, 7) + sstore(3, 9) + ret(0, 0)
    bb = BlockBuilder()
    bb.add_account(ALICE, balance=10**18)
    bb.add_account(CONTRACT_A, balance=0, nonce=1, code=code,
                   storage={1: 5})
    acl = [(CONTRACT_A, [b"\x00" * 31 + b"\x01", b"\x00" * 31 + b"\x03"])]
    txs = [bb.signed_tx(0, CONTRACT_A, gas=200_000, tx_type=1, acl=acl),
           bb.signed_tx(1, CONTRACT_A, gas=200_000, tx_type=0),
           bb.signed_tx(2, b"\x99" * 20, value=10**12, gas=21_000,
                        tx_type=0)]
    d, header, gas = bb.build(txs)
    check_guest(d, header)


def test_block_many_mixed_txs():
    code = (push(0) + b"\x35" + push(0) + b"\x55"        # sstore(0, cd)
            + push(0) + b"\x54" + b"\x5f\x52"            # mstore(0, sload)
            + push(32) + push(0) + push(0xE0) + b"\xa1"  # log1
            + ret(0, 32))
    bb = BlockBuilder()
    bb.add_account(ALICE, balance=10**19)
    bb.add_account(CONTRACT_A, balance=0, nonce=1, code=code)
    txs = []
    for i in range(12):
        if i % 3 == 0:
            txs.append(bb.signed_tx(i, b"\x60" * 20, value=10**13 + i,
                                    gas=21_000))
        else:
            txs.append(bb.signed_tx(i, CONTRACT_A,
                                    data=i.to_bytes(32, "big"),
                                    gas=120_000))
    d, header, gas = bb.build(txs, withdrawals=[(b"\x61" * 20, 999)])
    res = check_guest(d, header)
    assert res.user_cycles > 0
