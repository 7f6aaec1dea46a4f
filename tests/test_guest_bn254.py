"""Guest bn254 pairing differential tests (lib/bn254.c vs app/bn254.py).

The guest-side pairing backs the EVM precompile 0x08 inside the zkVM
(reference: substrate-bn patched onto risc0-bigint2 in the stateless
guest, SURVEY.md §2.2 guest crypto patches). Each case runs the C
implementation in the emulator over the SYS_BIGINT accelerator and
compares against the host oracle."""

import pytest

from zeth_tpu.app import bn254 as B
from zeth_tpu.cc import compile_c
from zeth_tpu.executor import Executor

GUEST = "zeth_tpu/guest"
LIBS = ["zeth_tpu/cc/runtime/lib.c", f"{GUEST}/lib/u256.c",
        f"{GUEST}/lib/bn254.c"]
INC = [f"{GUEST}/include"]

HARNESS = """
#include <stdint.h>
#include <zeth.h>
#include <u256.h>
#include <bn254.h>
static uint8_t buf[4 + 4 * 192];
static uint32_t out[1];
int main(void) {
  uint32_t len;
  int r;
  env_read(buf, 4);
  len = ((uint32_t)buf[0]) | ((uint32_t)buf[1] << 8)
      | ((uint32_t)buf[2] << 16) | ((uint32_t)buf[3] << 24);
  if (len) env_read(buf + 4, len);
  r = bn254_pairing_check(buf + 4, len);
  out[0] = (uint32_t)(r + 1);     /* -1/0/1 -> 0/1/2 */
  env_commit(out, 4);
  return 0;
}
"""

# G1 / G2 generators (EIP-197)
G1 = (1, 2)
G2 = ((10857046999023057135944570762232829481370756359578518086990519993285655852781,
       11559732032986387107991004021392285783925812861821192530917403151452391805634),
      (8495653923123431417604973247489272438418190587263600148770280649306958101930,
       4082367875863433681332203403145435568316851327593401208105741076214120093531))


def _enc_pair(p1, q2) -> bytes:
    ax, ay = p1 if p1 else (0, 0)
    (xr, xi), (yr, yi) = q2 if q2 else ((0, 0), (0, 0))
    out = b""
    for v in (ax, ay, xi, xr, yi, yr):    # G2 imaginary limb first
        out += int(v).to_bytes(32, "big")
    return out


_ELF = None


def _run(data: bytes) -> int:
    global _ELF
    if _ELF is None:
        import os
        src = os.path.join("/tmp", "bn254_harness.c")
        with open(src, "w") as f:
            f.write(HARNESS)
        _ELF = compile_c([src] + LIBS, include_dirs=INC)
    inp = len(data).to_bytes(4, "little") + data
    res = Executor(_ELF, input_bytes=inp).run()
    assert res.exit_code == 0, f"guest exited {res.exit_code}"
    return res.journal[0] - 1


def _host(data: bytes) -> int:
    pairs = []
    for off in range(0, len(data), 192):
        c = data[off:off + 192]
        ax = int.from_bytes(c[0:32], "big")
        ay = int.from_bytes(c[32:64], "big")
        bxi = int.from_bytes(c[64:96], "big")
        bxr = int.from_bytes(c[96:128], "big")
        byi = int.from_bytes(c[128:160], "big")
        byr = int.from_bytes(c[160:192], "big")
        if max(ax, ay, bxi, bxr, byi, byr) >= B.P:
            return -1
        g1 = None if (ax | ay) == 0 else (ax, ay)
        g2 = None if (bxr | bxi | byr | byi) == 0 else ((bxr, bxi), (byr, byi))
        pairs.append((g1, g2))
    try:
        return 1 if B.pairing_check(pairs) else 0
    except ValueError:
        return -1


def test_empty_input_is_one():
    assert _run(b"") == _host(b"") == 1


def test_valid_pairing_cancellation():
    # e(P, Q) * e(-P, Q) == 1
    neg_p = (1, B.P - 2)
    data = _enc_pair(G1, G2) + _enc_pair(neg_p, G2)
    assert _run(data) == _host(data) == 1


def test_nontrivial_product_is_zero():
    data = _enc_pair(G1, G2)
    assert _run(data) == _host(data) == 0


def test_infinity_pairs_skip():
    data = _enc_pair(None, G2) + _enc_pair(G1, None)
    assert _run(data) == _host(data) == 1


def test_invalid_g1_rejected():
    bad = (B.P - 1, 7)      # not on curve
    data = _enc_pair(bad, G2)
    assert _run(data) == _host(data) == -1


def test_coordinate_out_of_range_rejected():
    data = bytearray(_enc_pair(G1, G2))
    data[0:32] = int(B.P).to_bytes(32, "big")     # x == p
    data = bytes(data)
    assert _run(data) == _host(data) == -1
