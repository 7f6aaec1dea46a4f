"""Regenerate the committed block fixtures in tests/fixtures/.

Two fixtures (the regression-corpus role of the reference's cached
mainnet inputs, run-parallel.sh:93):
  - a Cancun-era block: transfer, contract storage write + log, sha256
    precompile call, contract creation, plus a withdrawal;
  - a Prague block: type-4 (EIP-7702) tx with a live delegation, a BLS
    pairing precompile call, a deposit-contract event (EIP-6110) and
    non-empty EIP-7002 request output, and an EIP-7623 floor-bound tx.

Both are validated before writing and are named input_0x<hash>.json.
"""

import glob
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from test_evm import CONTRACT, _mk_block, _signed_tx
    from test_prague import make_prague_block

    from zeth_tpu.app.chainspec import MAINNET
    from zeth_tpu.app.host import StatelessInput, validate_block

    fixdir = os.path.join(_ROOT, "tests", "fixtures")
    os.makedirs(fixdir, exist_ok=True)
    for old in glob.glob(os.path.join(fixdir, "input_0x*.json")):
        os.remove(old)

    bob = b"\x55" * 20
    create_code = bytes.fromhex("600a600c600039600a6000f3") + b"\xfe" * 10
    txs = [
        _signed_tx(0, bob, 12345, b"", gas=21_000),
        _signed_tx(1, CONTRACT, 0, (77).to_bytes(32, "big")),
        _signed_tx(2, b"\x00" * 19 + b"\x02", 0, b"hash me"),
        _signed_tx(3, None, 0, create_code, gas=120_000),
    ]
    d, header, gas = _mk_block(txs, withdrawals=[(bob, 5)])
    blocks = [(d, header)]

    d, header, _txs, _alice = make_prague_block()
    blocks.append((d, header))

    for d, header in blocks:
        inp = StatelessInput.from_json(d)
        h = validate_block(inp, MAINNET)
        assert h == header.hash()
        path = os.path.join(fixdir, f"input_0x{h.hex()}.json")
        with open(path, "w") as f:
            json.dump(d, f)
        print("wrote", path, f"({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
