"""Guest MPT differential test against the host trie (app/trie.py).

Builds a random trie host-side, ships its witness nodes + a scripted
op sequence (get/insert/delete) to a C guest, and compares the final
root — the oracle for the stateless-client guest's state machinery
(reference role: risc0-ethereum-trie inside the guest, SURVEY.md §2.2).
"""

import random
import struct

from zeth_tpu.app.trie import Trie
from zeth_tpu.cc import compile_c
from zeth_tpu.executor import Executor
from zeth_tpu.hash.keccak import keccak256

GUEST = "zeth_tpu/guest"
LIBS = ["zeth_tpu/cc/runtime/lib.c", f"{GUEST}/lib/u256.c",
        f"{GUEST}/lib/keccak.c", f"{GUEST}/lib/rlp.c", f"{GUEST}/lib/trie.c"]
INC = [f"{GUEST}/include"]

SRC = """
#include <stdint.h>
#include <string.h>
#include <zeth.h>
#include <keccak.h>
#include <trie.h>

static uint8_t root[32];
static uint8_t kbuf[64];
static uint8_t vbuf[1024];
static uint32_t hdr[4];
static trie_t t;

int main(void) {
  uint32_t n_nodes, n_ops, i;
  env_read(hdr, 8);
  n_nodes = hdr[0];
  n_ops = hdr[1];
  store_init(4096);
  for (i = 0; i < n_nodes; i++) {
    uint32_t len, pad;
    uint8_t *node;
    env_read(hdr, 4);
    len = hdr[0];
    pad = (len + 3u) & ~3u;
    node = (uint8_t *)gmalloc(pad);
    env_read(node, pad);
    store_add(node, len);
  }
  env_read(root, 32);
  trie_from_root(&t, root);
  for (i = 0; i < n_ops; i++) {
    uint32_t op, klen, vlen;
    env_read(hdr, 12);
    op = hdr[0];
    klen = hdr[1];
    vlen = hdr[2];
    env_read(kbuf, (klen + 3u) & ~3u);
    if (vlen) env_read(vbuf, (vlen + 3u) & ~3u);
    if (op == 0) {                      /* get: commit found-len + value hash */
      uint32_t gl;
      const uint8_t *gv = trie_get(&t, kbuf, klen, &gl);
      uint8_t d[32];
      uint32_t meta[1];
      meta[0] = gv ? gl + 1 : 0;
      keccak256(gv ? gv : kbuf, gl, d);
      env_commit(meta, 4);
      env_commit(d, 32);
    } else if (op == 1) {
      trie_insert(&t, kbuf, klen, vbuf, vlen);
    } else {
      trie_delete(&t, kbuf, klen);
    }
  }
  trie_root(&t, root);
  env_commit(root, 32);
  return 0;
}
"""


def pad4(b):
    return b + b"\x00" * (-len(b) % 4)


def run_trie_guest(nodes, root, ops):
    inp = struct.pack("<II", len(nodes), len(ops))
    for nd in nodes:
        inp += struct.pack("<I", len(nd)) + pad4(nd)
    inp += root
    for op, k, v in ops:
        inp += struct.pack("<III", op, len(k), len(v)) + pad4(k)
        if v:
            inp += pad4(v)
    elf = compile_c([SRC] + LIBS, include_dirs=INC)
    res = Executor(elf, input_bytes=inp).run()
    assert res.exit_code == 0, f"guest exited {res.exit_code}: {res.log!r}"
    return bytes(res.journal)


def test_guest_trie_differential():
    rng = random.Random(1234)
    host = Trie()
    keys = []
    for _ in range(60):
        k = rng.randbytes(rng.choice([1, 2, 8, 20, 32]))
        v = rng.randbytes(rng.randint(1, 80))
        host.insert(k, v)
        keys.append(k)
    root0 = host.root_hash()
    nodes = host.rlp_nodes()

    # scripted ops: gets on present + absent keys, updates, inserts, deletes
    ops = []
    expect_journal = b""
    shadow = Trie.from_rlp_nodes(nodes, root0)
    for k in rng.sample(keys, 10) + [b"\xff" * 20, b"absent"]:
        ops.append((0, k, b""))
        got = shadow.get(k)
        if got is None:
            expect_journal += struct.pack("<I", 0) + keccak256(k[:0])
        else:
            expect_journal += struct.pack("<I", len(got) + 1) + keccak256(got)
    for k in rng.sample(keys, 15):
        v = rng.randbytes(rng.randint(1, 60))
        ops.append((1, k, v))
        shadow.insert(k, v)
    for _ in range(10):
        k = rng.randbytes(rng.choice([8, 20]))
        v = rng.randbytes(rng.randint(1, 40))
        ops.append((1, k, v))
        shadow.insert(k, v)
    for k in rng.sample(keys, 20):
        ops.append((2, k, b""))
        shadow.delete(k)

    j = run_trie_guest(nodes, root0, ops)
    assert j[:-32] == expect_journal
    assert j[-32:] == shadow.root_hash()


def test_guest_trie_empty_and_single():
    # from empty root: inserts only
    ops = [(1, b"k1", b"v1"), (1, b"k2", b"v2" * 30), (2, b"k1", b"")]
    shadow = Trie()
    shadow.insert(b"k1", b"v1")
    shadow.insert(b"k2", b"v2" * 30)
    shadow.delete(b"k1")
    from zeth_tpu.app.trie import EMPTY_ROOT
    j = run_trie_guest([], EMPTY_ROOT, ops)
    assert j[-32:] == shadow.root_hash()


def test_guest_trie_delete_to_empty():
    from zeth_tpu.app.trie import _encode

    shadow = Trie()
    shadow.insert(b"only", b"x")
    # a sub-32-byte root node is not in rlp_nodes() (nothing references it
    # by digest); a real witness ships the root preimage explicitly
    nodes = shadow.rlp_nodes() + [_encode(shadow.root)]
    root0 = shadow.root_hash()
    from zeth_tpu.app.trie import EMPTY_ROOT
    j = run_trie_guest(nodes, root0, [(2, b"only", b"")])
    assert j[-32:] == EMPTY_ROOT
