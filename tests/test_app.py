"""App layer: RLP, MPT, sparse state, header hashing, CLI validate/prove."""

import json
import os

import numpy as np
import pytest

from zeth_tpu.app import rlp
from zeth_tpu.app.chainspec import MAINNET
from zeth_tpu.app.host import (BlockProcessor, Header, StatelessInput,
                               ValidationError, validate_block)
from zeth_tpu.app.state import Account, SparseState
from zeth_tpu.app.trie import EMPTY_ROOT, Trie
from zeth_tpu.hash.keccak import keccak256


# -- rlp ---------------------------------------------------------------------


def test_rlp_roundtrip():
    cases = [b"", b"a", b"\x7f", b"\x80", b"hello world" * 10,
             [b"a", [b"b", b"c"], b""], []]
    for c in cases:
        enc = rlp.encode(c)
        dec = rlp.decode_full(enc)
        assert dec == c


def test_rlp_known_encodings():
    assert rlp.encode(b"dog") == b"\x83dog"
    assert rlp.encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp.encode(b"") == b"\x80"
    assert rlp.encode(0) == b"\x80"
    assert rlp.encode(15) == b"\x0f"
    assert rlp.encode(1024) == b"\x82\x04\x00"


# -- trie --------------------------------------------------------------------


def test_trie_canonical_vector():
    t = Trie()
    for k, v in [(b"do", b"verb"), (b"dog", b"puppy"), (b"doge", b"coin"),
                 (b"horse", b"stallion")]:
        t.insert(k, v)
    assert t.root_hash().hex() == (
        "5991bb8c6514148a29db676a14ac506cd2cd5775ace63c30a4fe457715e9ac84")


def test_trie_fuzz_vs_dict_and_order_independence():
    import random
    random.seed(7)
    ref, t = {}, Trie()
    for _ in range(400):
        k = random.randbytes(random.randint(1, 6))
        if random.random() < 0.7 or k not in ref:
            v = random.randbytes(random.randint(1, 40))
            t.insert(k, v)
            ref[k] = v
        else:
            t.delete(k)
            del ref[k]
    for k, v in ref.items():
        assert t.get(k) == v
    items = list(ref.items())
    random.shuffle(items)
    t2 = Trie()
    for k, v in items:
        t2.insert(k, v)
    assert t2.root_hash() == t.root_hash()
    nodes = t.rlp_nodes()
    t3 = Trie.from_rlp_nodes(nodes, t.root_hash())
    for k, v in list(ref.items())[:25]:
        assert t3.get(k) == v


# -- sparse state ------------------------------------------------------------


def _addr(i):
    return i.to_bytes(20, "big")


def _build_state():
    t = Trie()
    accounts = {}
    for i in range(1, 6):
        a = Account(nonce=i, balance=i * 10**18, storage_root=EMPTY_ROOT,
                    code_hash=keccak256(b""))
        accounts[_addr(i)] = a
        t.insert(keccak256(_addr(i)), a.encode())
    return t, accounts


def test_sparse_state_reads_and_update():
    t, accounts = _build_state()
    root = t.root_hash()
    state = SparseState(root, t.rlp_nodes())
    a = state.account(_addr(3))
    assert a.nonce == 3 and a.balance == 3 * 10**18
    assert state.account(_addr(99)) is None

    post = {
        _addr(3): ({"nonce": 4, "balance": 1}, {b"\x01" * 32: 42}),
        _addr(5): None,  # destroyed
    }
    new_root = state.calculate_state_root(post)
    assert new_root != root
    # independent recomputation
    t2, _ = _build_state()
    st = Trie()
    st.insert(keccak256(b"\x01" * 32), rlp.encode(42))
    a3 = Account(nonce=4, balance=1, storage_root=st.root_hash(),
                 code_hash=keccak256(b""))
    t2.insert(keccak256(_addr(3)), a3.encode())
    t2.delete(keccak256(_addr(5)))
    assert t2.root_hash() == new_root


# -- header / validate / cli -------------------------------------------------


def _mk_header(number, parent_hash, state_root, timestamp=1800000000):
    h = Header({
        "parent_hash": parent_hash,
        "ommers_hash": keccak256(rlp.encode([])),
        "beneficiary": b"\x00" * 20,
        "state_root": state_root,
        "transactions_root": EMPTY_ROOT,
        "receipts_root": EMPTY_ROOT,
        "logs_bloom": b"\x00" * 256,
        "difficulty": 0,
        "number": number,
        "gas_limit": 30_000_000,
        "gas_used": 0,
        "timestamp": timestamp,
        "extra_data": b"",
        "mix_hash": b"\x00" * 32,
        "nonce": b"\x00" * 8,
        "base_fee_per_gas": 7,
        "withdrawals_root": EMPTY_ROOT,
        "blob_gas_used": 0,
        "excess_blob_gas": 0,
        "parent_beacon_block_root": b"\x00" * 32,
        # no deposits and empty request queues -> sha256 of empty concat
        # (EIP-7685)
        "requests_hash": __import__("hashlib").sha256(b"").digest(),
    })
    return h


# Stand-in EIP-7002/7251 system contracts for synthetic fixtures: return
# empty request queues (PUSH1 0 PUSH1 0 RETURN). Real witnesses carry the
# real deployed contracts; the host only needs them present + executable.
_EMPTY_QUEUE_CODE = bytes.fromhex("60006000f3")


def _fixture_input():
    from zeth_tpu.app.host import (CONSOLIDATION_REQUESTS_ADDRESS,
                                   WITHDRAWAL_REQUESTS_ADDRESS)
    t, _ = _build_state()
    for addr in (WITHDRAWAL_REQUESTS_ADDRESS, CONSOLIDATION_REQUESTS_ADDRESS):
        a = Account(nonce=1, balance=0, storage_root=EMPTY_ROOT,
                    code_hash=keccak256(_EMPTY_QUEUE_CODE))
        t.insert(keccak256(addr), a.encode())
    pre_root = t.root_hash()
    parent = _mk_header(100, b"\x11" * 32, pre_root)
    block = _mk_header(101, parent.hash(), pre_root)
    wit_json = {
        "state": ["0x" + n.hex() for n in t.rlp_nodes()],
        "codes": ["0x" + _EMPTY_QUEUE_CODE.hex()],
        "headers": ["0x" + parent.encode().hex()],
    }
    hj = {}
    for name in block.fields:
        v = block.fields[name]
        hj[name] = v if isinstance(v, int) else "0x" + v.hex()
    return {"block": {"header": hj, "body": {"transactions": []}},
            "witness": wit_json}, block


def test_header_rlp_roundtrip():
    _, block = _fixture_input()
    back = Header.from_rlp(block.encode())
    assert back.fields == block.fields
    assert back.hash() == block.hash()


def test_validate_block_ok_and_failures():
    d, block = _fixture_input()
    inp = StatelessInput.from_json(d)
    assert validate_block(inp, MAINNET) == block.hash()

    bad = json.loads(json.dumps(d))
    bad["witness"]["state"] = bad["witness"]["state"][1:]  # drop a node
    with pytest.raises(ValidationError):
        validate_block(StatelessInput.from_json(bad), MAINNET)

    bad2 = json.loads(json.dumps(d))
    bad2["block"]["header"]["parent_hash"] = "0x" + "22" * 32
    with pytest.raises(ValidationError):
        validate_block(StatelessInput.from_json(bad2), MAINNET)


def test_cli_validate_and_dev_prove(tmp_path, monkeypatch):
    from zeth_tpu.app import cli
    d, block = _fixture_input()
    proc = BlockProcessor.for_chain_id(1)
    proc.save_input(str(tmp_path), d)
    monkeypatch.setenv("ZETH_DEV_MODE", "1")
    rc = cli.main(["--cache-dir", str(tmp_path), "--block", "101", "prove"])
    assert rc == 0
    monkeypatch.delenv("ZETH_DEV_MODE")
    rc = cli.main(["--cache-dir", str(tmp_path), "validate"])
    assert rc == 0


# -- rpc proxy ---------------------------------------------------------------


def test_rpc_proxy_forwards_and_serves_witness():
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from zeth_tpu.app import rpc_proxy

    calls = []

    class FakeUpstream(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            calls.append(body["method"])
            if body["method"] == "debug_executionWitness":
                result = {"state": ["0xdead"], "codes": [], "keys": [],
                          "headers": []}
            elif body["method"] == "eth_chainId":
                result = "0x1"
            else:
                result = None
            raw = json.dumps({"jsonrpc": "2.0", "id": body["id"],
                              "result": result}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

    up = ThreadingHTTPServer(("127.0.0.1", 0), FakeUpstream)
    threading.Thread(target=up.serve_forever, daemon=True).start()
    up_url = f"http://127.0.0.1:{up.server_address[1]}"

    handler = type("H", (rpc_proxy.ProxyHandler,),
                   {"upstream": rpc_proxy.Upstream(up_url, max_retries=1)})
    proxy = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=proxy.serve_forever, daemon=True).start()

    import urllib.request

    def call(method, params):
        req = urllib.request.Request(
            f"http://127.0.0.1:{proxy.server_address[1]}",
            data=json.dumps({"jsonrpc": "2.0", "id": 7, "method": method,
                             "params": params}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as resp:
            return json.load(resp)

    out = call("eth_chainId", [])
    assert out["result"] == "0x1"
    out = call("debug_executionWitness", ["0x64"])
    assert out["result"]["state"] == ["0xdead"]
    assert "eth_chainId" in calls and "debug_executionWitness" in calls
    up.shutdown()
    proxy.shutdown()


# -- run-parallel pipeline ---------------------------------------------------


def test_run_parallel_csv(tmp_path, monkeypatch):
    from zeth_tpu.app import run_parallel
    d, block = _fixture_input()
    proc = BlockProcessor.for_chain_id(1)
    proc.save_input(str(tmp_path), d)
    monkeypatch.setenv("ZETH_DEV_MODE", "1")
    out = tmp_path / "results.csv"
    rc = run_parallel.main(["--jobs", "1", "--cache-dir", str(tmp_path),
                            "--output", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("block_number,execution_time,total_cycles")
    assert lines[1].startswith("101,")
