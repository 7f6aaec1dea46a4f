"""Guest BLS12-381 KZG verify vs the host oracle (app/kzg.py).

The guest library (guest/lib/bls381.c) runs every Fp mulmod on the
384-bit SYS_BIGINT accelerator; the host oracle is pure python. The
trusted setup is a locally generated tau (the verification algebra is
identical to mainnet's; the ceremony constant is provisioned at build
time for production guests)."""

import hashlib

import pytest

from zeth_tpu.app import bls12381 as B
from zeth_tpu.app import kzg
from zeth_tpu.cc import compile_c
from zeth_tpu.executor import Executor

GUEST = "zeth_tpu/guest"

HARNESS = r"""
#include <stdint.h>
#include <string.h>
#include <zeth.h>
#include <bls381.h>
static uint8_t inp[48 + 32 + 32 + 48 + 192];
int main(void) {
  uint32_t setup[48];
  int r;
  uint32_t out;
  env_read(inp, sizeof inp);
  memcpy(setup, inp + 160, 192);
  r = bls_kzg_verify(inp, inp + 48, inp + 80, inp + 112, setup);
  out = (uint32_t)(r + 1);   /* -1,0,1 -> 0,1,2 */
  env_commit(&out, 4);
  env_halt(0);
  return 0;
}
"""

TAU = 0x1BEEF00D5EED


def _limb_words(x: int) -> bytes:
    return b"".join(((x >> (32 * i)) & 0xFFFFFFFF).to_bytes(4, "little")
                    for i in range(12))


def _setup_bytes() -> bytes:
    pt = kzg._SETUP_G2
    return (_limb_words(pt[0][0]) + _limb_words(pt[0][1])
            + _limb_words(pt[1][0]) + _limb_words(pt[1][1]))


@pytest.fixture(scope="module")
def harness_elf(tmp_path_factory):
    src = tmp_path_factory.mktemp("kzgh") / "harness.c"
    src.write_text(HARNESS)
    return compile_c(
        [str(src), "zeth_tpu/cc/runtime/lib.c", f"{GUEST}/lib/bls381.c"],
        include_dirs=[f"{GUEST}/include"])


@pytest.fixture()
def dev_tau():
    kzg.dev_setup(TAU)
    yield TAU
    kzg._SETUP_G2 = None


def _run(elf, c48, z, y, w48):
    inp = (c48 + z.to_bytes(32, "big") + y.to_bytes(32, "big") + w48
           + _setup_bytes())
    res = Executor(elf, input_bytes=inp).run()
    assert res.exit_code == 0
    return res.journal[0] - 1, res


def test_guest_kzg_verify_matches_host(harness_elf, dev_tau):
    import sys
    sys.path.insert(0, "tests")
    from test_kzg import _commit_poly, _kzg_open
    coeffs = [3, 1, 4, 1, 5]
    z = 0xABCD
    y, w = _kzg_open(coeffs, z, dev_tau)
    c48 = kzg.g1_compress(_commit_poly(coeffs, dev_tau))
    w48 = kzg.g1_compress(w)
    assert kzg.verify_kzg_proof(c48, z, y, w48)   # host oracle agrees

    r, res = _run(harness_elf, c48, z, y, w48)
    assert r == 1
    # a wrong claimed value must be rejected in-guest too
    r2, _ = _run(harness_elf, c48, z, (y + 1) % B.R, w48)
    assert r2 == 0
    # malformed commitment (x not on curve) is a hard input error
    bad = bytearray(c48)
    bad[47] ^= 1
    r3, _ = _run(harness_elf, bytes(bad), z, y, w48)
    assert r3 == -1
    # the accelerator does the heavy lifting
    assert res.bigint_calls > 10000
