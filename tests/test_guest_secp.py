"""Guest secp256k1 ecrecover differential test.

Signs messages host-side (pure-Python secp256k1) and has the guest
recover the signer address through the SYS_BIGINT accelerator path —
the oracle for tx sender recovery and the 0x01 precompile in the
stateless-client guest (reference role: k256 over risc0-bigint2,
SURVEY.md §2.1 guest crypto patches)."""

import random
import struct

from zeth_tpu.cc import compile_c
from zeth_tpu.executor import Executor
from zeth_tpu.hash.keccak import keccak256

GUEST = "zeth_tpu/guest"
LIBS = ["zeth_tpu/cc/runtime/lib.c", f"{GUEST}/lib/u256.c",
        f"{GUEST}/lib/keccak.c", f"{GUEST}/lib/secp256k1.c"]
INC = [f"{GUEST}/include"]

P = 2**256 - 2**32 - 977
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


def _inv(a, m):
    return pow(a, m - 2, m)


def _add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = 3 * x1 * x1 * _inv(2 * y1, P) % P
    else:
        lam = (y2 - y1) * _inv(x2 - x1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def _mul(k, pt):
    acc = None
    while k:
        if k & 1:
            acc = _add(acc, pt)
        pt = _add(pt, pt)
        k >>= 1
    return acc


def _sign(priv, msg_hash):
    z = int.from_bytes(msg_hash, "big") % N
    while True:
        k = random.getrandbits(256) % N
        if not k:
            continue
        x, y = _mul(k, (GX, GY))
        r = x % N
        if r == 0:
            continue
        s = _inv(k, N) * (z + r * priv) % N
        if s == 0:
            continue
        recid = (y & 1) ^ (1 if x != r else 0) * 0  # x < N in practice
        recid = y & 1
        return r, s, recid


def _addr(priv):
    x, y = _mul(priv, (GX, GY))
    return keccak256(x.to_bytes(32, "big") + y.to_bytes(32, "big"))[12:]


SRC = """
#include <stdint.h>
#include <string.h>
#include <zeth.h>
#include <u256.h>
#include <secp256k1.h>

static uint8_t buf[100];
static uint8_t out[24];

int main(void) {
  uint32_t n, i;
  uint32_t hdr[1];
  env_read(hdr, 4);
  n = hdr[0];
  for (i = 0; i < n; i++) {
    u256 r, s;
    uint32_t ok;
    env_read(buf, 100);               /* hash(32) r(32) s(32) recid(4) */
    u256_from_be(&r, buf + 32);
    u256_from_be(&s, buf + 64);
    memset(out, 0, 24);
    ok = secp_ecrecover(buf, ((uint32_t *)(buf + 96))[0], &r, &s, out + 4);
    ((uint32_t *)out)[0] = ok;
    env_commit(out, 24);
  }
  return 0;
}
"""


def test_guest_ecrecover():
    random.seed(99)
    cases = []
    for i in range(6):
        priv = random.getrandbits(256) % N or 1
        msg = bytes([i]) * 32
        h = keccak256(msg)
        r, s, recid = _sign(priv, h)
        cases.append((h, r, s, recid, 1, _addr(priv)))
    # invalid: r = 0
    cases.append((b"\x01" * 32, 0, 5, 0, 0, b"\x00" * 20))
    # invalid: s >= N
    cases.append((b"\x02" * 32, 5, N, 1, 0, b"\x00" * 20))
    # invalid: non-residue x (x^3+7 not a square for most tweaked r)
    h, r, s, recid, _, _ = cases[0]
    bad_r = r
    while pow(pow(bad_r, 3, P) + 7, (P - 1) // 2, P) == 1:
        bad_r += 1
    cases.append((h, bad_r, s, recid, 0, b"\x00" * 20))

    inp = struct.pack("<I", len(cases))
    for h, r, s, recid, _, _ in cases:
        inp += h + int(r).to_bytes(32, "big") + int(s).to_bytes(32, "big")
        inp += struct.pack("<I", recid)

    elf = compile_c([SRC] + LIBS, include_dirs=INC)
    res = Executor(elf, input_bytes=inp).run()
    assert res.exit_code == 0, res.log
    j = bytes(res.journal)
    assert len(j) == 24 * len(cases)
    for k, (h, r, s, recid, ok, addr) in enumerate(cases):
        got_ok = struct.unpack("<I", j[k * 24:k * 24 + 4])[0]
        got_addr = j[k * 24 + 4:k * 24 + 24]
        assert got_ok == ok, f"case {k}: ok={got_ok} want {ok}"
        if ok:
            assert got_addr == addr, f"case {k}: wrong address"
    assert res.bigint_calls > 1000   # the ladder really used the accelerator
