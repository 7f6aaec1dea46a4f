"""Guest C library differential tests (u256 / keccak / RLP).

Each test compiles a small C harness that reads operands from the zkVM
input stream, applies guest-library ops, and commits results; the
journal is compared against Python oracles. This is the oracle ladder
for the stateless-client guest (SURVEY.md §7.2 step: every phase has a
bit-exactness oracle)."""

import struct

import pytest

from zeth_tpu.cc import compile_c
from zeth_tpu.executor import Executor
from zeth_tpu.hash.keccak import keccak256

GUEST = "zeth_tpu/guest"
LIBS = ["zeth_tpu/cc/runtime/lib.c", f"{GUEST}/lib/u256.c",
        f"{GUEST}/lib/keccak.c", f"{GUEST}/lib/rlp.c"]
INC = [f"{GUEST}/include"]


def run_guest(src, inp=b""):
    elf = compile_c([src] + LIBS, include_dirs=INC)
    res = Executor(elf, input_bytes=inp).run()
    assert res.exit_code == 0, f"guest exited {res.exit_code}"
    return res


def be(x, n=32):
    return int(x).to_bytes(n, "big")


P256 = 2**256


def test_u256_ops_differential():
    import random
    rng = random.Random(42)
    cases = []
    for _ in range(24):
        a = rng.getrandbits(rng.choice([16, 32, 64, 255, 256]))
        b = rng.getrandbits(rng.choice([8, 32, 128, 256]))
        cases.append((a, b))
    cases += [(0, 0), (P256 - 1, P256 - 1), (P256 - 1, 1), (1, P256 - 1),
              (2**128, 2**128), (5, 0), (0, 5)]

    inp = b"".join(be(a) + be(b) for a, b in cases)
    n = len(cases)
    src = """
    #include <stdint.h>
    #include <string.h>
    #include <zeth.h>
    #include <u256.h>
    static uint8_t buf[64];
    static uint8_t out[9 * 32];
    int main(void) {
      uint32_t i;
      for (i = 0; i < %d; i++) {
        u256 a, b, r;
        env_read(buf, 64);
        u256_from_be(&a, buf);
        u256_from_be(&b, buf + 32);
        u256_add(&r, &a, &b);   u256_to_be(&r, out);
        u256_sub(&r, &a, &b);   u256_to_be(&r, out + 32);
        u256_mul(&r, &a, &b);   u256_to_be(&r, out + 64);
        u256_div(&r, &a, &b);   u256_to_be(&r, out + 96);
        u256_mod(&r, &a, &b);   u256_to_be(&r, out + 128);
        u256_sdiv(&r, &a, &b);  u256_to_be(&r, out + 160);
        u256_smod(&r, &a, &b);  u256_to_be(&r, out + 192);
        u256_exp(&r, &a, &b);   u256_to_be(&r, out + 224);
        u256_shl(&r, &a, b.w[0] & 511); u256_to_be(&r, out + 256);
        env_commit(out, 9 * 32);
      }
      return 0;
    }
    """ % n
    res = run_guest(src, inp)
    j = bytes(res.journal)
    assert len(j) == n * 9 * 32

    def sgn(x):
        return x - P256 if x >> 255 else x

    for k, (a, b) in enumerate(cases):
        got = [int.from_bytes(j[k * 288 + i * 32:k * 288 + (i + 1) * 32],
                              "big") for i in range(9)]
        sa, sb = sgn(a), sgn(b)
        sdiv = 0 if b == 0 else abs(sa) // abs(sb) * (1 if (sa < 0) == (sb < 0) else -1)
        smod = 0 if b == 0 else abs(sa) % abs(sb) * (1 if sa >= 0 else -1)
        exp = [(a + b) % P256, (a - b) % P256, (a * b) % P256,
               0 if b == 0 else a // b, 0 if b == 0 else a % b,
               sdiv % P256, smod % P256, pow(a, b, P256),
               (a << (b & 511)) % P256 if (b & 511) < 256 else 0]
        assert got == exp, f"case {k}: a={a:#x} b={b:#x}\n{got}\n{exp}"


def test_u256_modops_via_accelerator():
    import random
    rng = random.Random(7)
    cases = []
    for _ in range(12):
        a = rng.getrandbits(256)
        b = rng.getrandbits(256)
        m = rng.getrandbits(rng.choice([16, 64, 255, 256])) | 1
        cases.append((a, b, m))
    cases += [(P256 - 1, P256 - 1, P256 - 1), (5, 7, 0), (P256 - 1, 2, 3)]
    inp = b"".join(be(a) + be(b) + be(m) for a, b, m in cases)
    src = """
    #include <stdint.h>
    #include <string.h>
    #include <zeth.h>
    #include <u256.h>
    static uint8_t buf[96];
    static uint8_t out[64];
    int main(void) {
      uint32_t i;
      for (i = 0; i < %d; i++) {
        u256 a, b, m, r;
        env_read(buf, 96);
        u256_from_be(&a, buf);
        u256_from_be(&b, buf + 32);
        u256_from_be(&m, buf + 64);
        u256_mulmod(&r, &a, &b, &m); u256_to_be(&r, out);
        u256_addmod(&r, &a, &b, &m); u256_to_be(&r, out + 32);
        env_commit(out, 64);
      }
      return 0;
    }
    """ % len(cases)
    res = run_guest(src, inp)
    j = bytes(res.journal)
    for k, (a, b, m) in enumerate(cases):
        mm = int.from_bytes(j[k * 64:k * 64 + 32], "big")
        am = int.from_bytes(j[k * 64 + 32:k * 64 + 64], "big")
        assert mm == ((a * b) % m if m else 0), f"mulmod case {k}"
        assert am == ((a + b) % m if m else 0), f"addmod case {k}"
    assert res.bigint_calls > 0


def test_guest_keccak256():
    msgs = [b"", b"abc", b"a" * 135, b"b" * 136, b"c" * 137, b"d" * 500,
            bytes(range(256)) * 2]
    inp = b"".join(struct.pack("<I", len(m)) + m + b"\x00" * (-len(m) % 4)
                   for m in msgs)
    src = """
    #include <stdint.h>
    #include <string.h>
    #include <zeth.h>
    #include <keccak.h>
    static uint8_t buf[1024];
    static uint8_t d[32];
    static uint32_t lenw[1];
    int main(void) {
      uint32_t i;
      for (i = 0; i < %d; i++) {
        uint32_t n, padded;
        env_read(lenw, 4);
        n = lenw[0];
        padded = (n + 3u) & ~3u;
        env_read(buf, padded);
        keccak256(buf, n, d);
        env_commit(d, 32);
      }
      return 0;
    }
    """ % len(msgs)
    res = run_guest(src, inp)
    j = bytes(res.journal)
    for k, m in enumerate(msgs):
        assert j[k * 32:(k + 1) * 32] == keccak256(m), f"msg {k}"
    # unaligned source path
    src2 = """
    #include <stdint.h>
    #include <string.h>
    #include <zeth.h>
    #include <keccak.h>
    static uint8_t buf[64];
    static uint8_t d[32];
    int main(void) {
      env_read(buf, 64);
      keccak256(buf + 1, 40, d);
      env_commit(d, 32);
      return 0;
    }
    """
    payload = bytes(range(64))
    res2 = run_guest(src2, payload)
    assert bytes(res2.journal) == keccak256(payload[1:41])


def test_guest_rlp():
    # decode a nested list, re-encode scalars, compare with app rlp
    from zeth_tpu.app.rlp import encode as rlp_encode

    items = [b"", b"\x01", b"\x7f", b"\x80", b"dog", b"x" * 55, b"y" * 60,
             b"z" * 300]
    blob = rlp_encode([items, b"\x05", [b"cat", [b"deep"]]])
    src = """
    #include <stdint.h>
    #include <string.h>
    #include <zeth.h>
    #include <rlp.h>
    static uint8_t buf[2048];
    static uint8_t enc[2048];
    static uint32_t meta[16];
    int main(void) {
      uint32_t n, padded;
      rlp_t top, l0, it;
      const uint8_t *cur = 0;
      uint32_t i = 0;
      n = env_read(buf, 2048);
      if (!rlp_parse(buf, buf + n, &top)) return 2;
      if (!top.is_list || rlp_count(&top) != 3) return 3;
      if (!rlp_at(&top, 0, &l0)) return 4;
      meta[0] = rlp_count(&l0);
      while (rlp_next(&l0, &cur, &it) && i < 8) {
        meta[1 + i] = it.len | (it.is_list << 31);
        i++;
      }
      /* re-encode the same structure and commit it */
      {
        rlpw_t w;
        uint32_t m_top, m_l0, m_l2, m_l2i;
        rlp_t l2, c0, c1, d0;
        rlpw_init(&w, enc, 2048);
        m_top = rlpw_list_begin(&w);
        m_l0 = rlpw_list_begin(&w);
        cur = 0;
        while (rlp_next(&l0, &cur, &it))
          rlpw_bytes(&w, it.p, it.len);
        rlpw_list_end(&w, m_l0);
        rlp_at(&top, 1, &it);
        rlpw_bytes(&w, it.p, it.len);
        rlp_at(&top, 2, &l2);
        rlp_at(&l2, 0, &c0);
        rlp_at(&l2, 1, &c1);
        rlp_at(&c1, 0, &d0);
        m_l2 = rlpw_list_begin(&w);
        rlpw_bytes(&w, c0.p, c0.len);
        m_l2i = rlpw_list_begin(&w);
        rlpw_bytes(&w, d0.p, d0.len);
        rlpw_list_end(&w, m_l2i);
        rlpw_list_end(&w, m_l2);
        rlpw_list_end(&w, m_top);
        if (rlpw_overflowed(&w)) return 5;
        meta[9] = w.len;
        env_commit(meta, 64);
        env_commit(enc, (w.len + 3u) & ~3u);
      }
      return 0;
    }
    """
    padded = blob + b"\x00" * (-len(blob) % 4)
    res = run_guest(src, padded)
    j = bytes(res.journal)
    meta = struct.unpack("<16I", j[:64])
    assert meta[0] == len(items)
    for i, it in enumerate(items):
        assert meta[1 + i] == len(it)
    enc_len = meta[9]
    assert j[64:64 + enc_len] == blob
