"""zeth-cc compiler tests: C guests compiled to RV32IM and executed.

The compiler fills the reference's guest cross-toolchain role
(SURVEY.md §2.1 `guests` builder); these tests are its oracle — each
program's committed journal is checked against the same computation in
Python. Coverage targets the codegen paths that historically break C
compilers: spilling under register pressure, branch-join temp
locations, switch fallthrough, sub-word loads/stores, pointer
arithmetic, and function pointers.
"""

import struct

import pytest

from zeth_tpu.cc import CompileError, compile_c
from zeth_tpu.executor import Executor

LIB = "zeth_tpu/cc/runtime/lib.c"


def run_c(src, inp=b"", lib=True):
    elf = compile_c([src, LIB] if lib else [src])
    res = Executor(elf, input_bytes=inp).run()
    assert res.exit_code == 0, f"guest exit {res.exit_code}"
    return res


def words(b):
    return list(struct.unpack(f"<{len(b) // 4}I", bytes(b)))


HDR = "#include <stdint.h>\n#include <string.h>\n#include <zeth.h>\n"


def commit_main(body, n_words):
    return (HDR + "static uint32_t out[%d];\n" % n_words
            + "int main(void){\n" + body
            + f"\nenv_commit(out, {4 * n_words}); return 0; }}\n")


def test_arith_and_compare():
    res = run_c(commit_main("""
      uint32_t a = 0xDEAD0001u, b = 77;
      int sa = -1000, sb = 7;
      out[0] = a + b; out[1] = a - b; out[2] = a * b;
      out[3] = a / b; out[4] = a % b;
      out[5] = (uint32_t)(sa / sb); out[6] = (uint32_t)(sa % sb);
      out[7] = (uint32_t)(sa >> 3); out[8] = a >> 3; out[9] = a << 9;
      out[10] = (a < b); out[11] = (sa < sb); out[12] = (a >= b);
      out[13] = (sa <= -1000); out[14] = (a == 0xDEAD0001u);
      out[15] = (a != a);
    """, 16))
    a, b, sa, sb = 0xDEAD0001, 77, -1000, 7
    exp = [(a + b) & 0xFFFFFFFF, (a - b) & 0xFFFFFFFF, (a * b) & 0xFFFFFFFF,
           a // b, a % b, (-(1000 // 7)) & 0xFFFFFFFF, (-(1000 % 7)) & 0xFFFFFFFF,
           (sa >> 3) & 0xFFFFFFFF, a >> 3, (a << 9) & 0xFFFFFFFF,
           0, 1, 1, 1, 1, 0]
    assert words(res.journal) == exp


def test_register_pressure_spill():
    # 12-deep expression tree forces spills of live temporaries
    res = run_c(commit_main("""
      uint32_t x = 3;
      out[0] = ((((x+1)*(x+2)) + ((x+3)*(x+4))) * (((x+5)*(x+6)) +
                ((x+7)*(x+8)))) + ((((x+9)*(x+10)) + ((x+11)*(x+12))) *
                (((x+13)*(x+14)) + ((x+15)*(x+16))));
    """, 1))
    x = 3
    exp = ((((x+1)*(x+2)) + ((x+3)*(x+4))) * (((x+5)*(x+6)) + ((x+7)*(x+8)))
           + (((x+9)*(x+10)) + ((x+11)*(x+12)))
           * (((x+13)*(x+14)) + ((x+15)*(x+16)))) & 0xFFFFFFFF
    assert words(res.journal) == [exp]


def test_structs_pointers_subword():
    res = run_c(HDR + """
    typedef struct Node { uint8_t tag; uint16_t len; uint32_t val;
                          struct Node *next; } Node;
    static Node a, b;
    static uint32_t out[6];
    int main(void) {
      a.tag = 0x1FF;            /* truncates to 0xFF */
      a.len = 0x1BEEF;          /* truncates to 0xBEEF */
      a.val = 42; a.next = &b;
      b = a;                    /* struct assignment */
      b.val = 7;
      a.next->next = &a;
      Node *p = &a;
      out[0] = p->tag; out[1] = p->len; out[2] = p->val;
      out[3] = p->next->val;
      out[4] = (p->next->next == &a);
      out[5] = sizeof(Node);
      env_commit(out, 24); return 0; }
    """)
    assert words(res.journal) == [0xFF, 0xBEEF, 42, 7, 1, 12]


def test_switch_fallthrough_and_range():
    src = HDR + """
    static uint32_t out[8];
    uint32_t classify(uint32_t op) {
      uint32_t r = 0;
      switch (op) {
        case 1: r += 1;        /* falls through */
        case 2: r += 10; break;
        case 5: r = 50; break;
        case 100: r = 100; break;
        case 200: r = 200; break;
        case 0x80000000u: r = 77; break;
        default: r = 999; break;
      }
      return r;
    }
    int main(void) {
      out[0] = classify(1); out[1] = classify(2); out[2] = classify(5);
      out[3] = classify(100); out[4] = classify(200);
      out[5] = classify(0x80000000u);
      out[6] = classify(3); out[7] = classify(0xFFFFFFFFu);
      env_commit(out, 32); return 0; }
    """
    res = run_c(src)
    assert words(res.journal) == [11, 10, 50, 100, 200, 77, 999, 999]


def test_shortcircuit_ternary_logic():
    res = run_c(HDR + """
    static uint32_t calls = 0;
    static uint32_t out[6];
    uint32_t bump(uint32_t v) { calls++; return v; }
    int main(void) {
      out[0] = (0 && bump(1)) ? 5 : 6;      /* bump not called */
      out[1] = calls;
      out[2] = (1 || bump(1)) ? 7 : 8;      /* bump not called */
      out[3] = calls;
      out[4] = bump(0) || bump(3);          /* both called */
      out[5] = calls;
      env_commit(out, 24); return 0; }
    """)
    assert words(res.journal) == [6, 0, 7, 0, 1, 2]


def test_loops_break_continue_goto():
    res = run_c(commit_main("""
      uint32_t s = 0, i = 0;
      while (1) { i++; if (i > 10) break; if (i & 1) continue; s += i; }
      out[0] = s;                           /* 2+4+6+8+10 = 30 */
      s = 0;
      for (i = 0; i < 100; i++) { if (i == 7) goto done; s += i; }
      done: out[1] = s;                     /* 0..6 = 21 */
      s = 0; i = 0;
      do { s += ++i; } while (i < 5);
      out[2] = s;                           /* 1+2+3+4+5 */
    """, 3))
    assert words(res.journal) == [30, 21, 15]


def test_string_and_mem_builtins():
    res = run_c(HDR + """
    static const char msg[] = "hello\\x01\\xFF";
    static uint32_t out[5];
    static uint8_t buf[16];
    int main(void) {
      out[0] = strlen(msg);
      memset(buf, 0xAB, 16);
      out[1] = buf[0] | ((uint32_t)buf[15] << 8);
      memcpy(buf, msg, 8);
      out[2] = buf[0] | ((uint32_t)buf[4] << 8) | ((uint32_t)buf[6] << 16);
      out[3] = (uint32_t)memcmp("abc", "abd", 3);
      out[4] = (uint32_t)memcmp("abc", "abc", 3);
      env_commit(out, 20); return 0; }
    """)
    w = words(res.journal)
    assert w[0] == 7
    assert w[1] == 0xAB | (0xAB << 8)
    assert w[2] == ord("h") | (ord("o") << 8) | (0xFF << 16)
    assert w[3] == (0xFFFFFFFF & (ord("c") - ord("d")))
    assert w[4] == 0


def test_function_pointers():
    res = run_c(HDR + """
    uint32_t f1(uint32_t x) { return x + 1; }
    uint32_t f2(uint32_t x) { return x * 2; }
    typedef uint32_t (*fn)(uint32_t);
    static fn table[2] = {f1, f2};
    static uint32_t out[2];
    int main(void) {
      fn g = table[1];
      out[0] = table[0](10);
      out[1] = g(10);
      env_commit(out, 8); return 0; }
    """)
    assert words(res.journal) == [11, 20]


def test_input_echo_and_syscalls():
    inp = bytes(range(1, 65))
    res = run_c(HDR + """
    static uint8_t buf[64];
    int main(void) {
      uint32_t n = env_read(buf, 64);
      if (n != 64) return 1;
      env_commit(buf, 64);
      return 0; }
    """, inp=inp)
    assert bytes(res.journal) == inp


def test_keccak_and_sha_syscalls():
    res = run_c(HDR + """
    static uint32_t st[50];
    static uint32_t sha_io[32];
    int main(void) {
      sys_keccakf(st);
      env_commit(st, 8);
      /* sha256 IV + the canonical "abc" block */
      sha_io[0]=0x6a09e667u; sha_io[1]=0xbb67ae85u; sha_io[2]=0x3c6ef372u;
      sha_io[3]=0xa54ff53au; sha_io[4]=0x510e527fu; sha_io[5]=0x9b05688cu;
      sha_io[6]=0x1f83d9abu; sha_io[7]=0x5be0cd19u;
      sha_io[8]=0x61626380u;
      sha_io[23]=0x00000018u;
      sys_sha256_compress(sha_io);
      env_commit(sha_io + 24, 32);
      return 0; }
    """)
    w = words(res.journal)
    # keccak-f of the zero state, first two lanes
    assert (w[0] | (w[1] << 32)) == 0xF1258F7940E1DDE7
    # sha256("abc")
    digest = b"".join(x.to_bytes(4, "big") for x in w[2:10])
    import hashlib
    assert digest == hashlib.sha256(b"abc").digest()


def test_bigint_syscall():
    # 384-bit accelerator width: [a | b | m | r], 12 words per slot
    res = run_c(HDR + """
    static uint32_t io[48];
    int main(void) {
      io[0] = 0xFFFFFFFFu; io[1] = 0xFFFFFFFFu;   /* a = 2^64 - 1 */
      io[12] = 0xFFFFFFFFu; io[13] = 0xFFFFFFFFu; /* b = 2^64 - 1 */
      io[24] = 0xFFFFFFEFu; io[25] = 0xFFFFFFFFu; io[26] = 0xFFFFFFFFu;
      io[27] = 0xFFFFFFFFu; io[28] = 0xFFFFFFFFu; io[29] = 0xFFFFFFFFu;
      io[30] = 0xFFFFFFFFu; io[31] = 0xFFFFFFFFu; /* m = 2^256 - 17 */
      sys_bigint_modmul(io);
      env_commit(io + 36, 48);
      return 0; }
    """)
    w = words(res.journal)
    r = 0
    for i, x in enumerate(w):
        r |= x << (32 * i)
    assert r == ((2**64 - 1) ** 2) % (2**256 - 17)


def test_long_branch_over_big_body():
    # an if-body larger than the +-4KB B-type range: requires the
    # compiler's long-form conditional branches
    body = "\n".join(f"      x += {i};" for i in range(1, 1501))
    res = run_c(commit_main(f"""
      uint32_t x = 1;
      if (x == 99) {{
{body}
      }}
      out[0] = x;
    """, 1))
    assert words(res.journal) == [1]


def test_heap_alloc():
    res = run_c(HDR + "#include <alloc.h>\n" + """
    static uint32_t out[3];
    int main(void) {
      uint32_t *a = (uint32_t *)gmalloc(40);
      uint32_t *b = (uint32_t *)gcalloc(8);
      uint32_t i;
      for (i = 0; i < 10; i++) a[i] = i * i;
      out[0] = a[9]; out[1] = b[1]; out[2] = (a != b);
      env_commit(out, 12); return 0; }
    """)
    assert words(res.journal) == [81, 0, 1]


def test_compound_assign_and_incdec():
    res = run_c(commit_main("""
      uint32_t x = 100; uint32_t arr[4] = {1, 2, 3, 4};
      uint32_t *p = arr; uint32_t i = 1;
      x += 5; x -= 2; x *= 3; x /= 2; x <<= 1; x ^= 0xF0; x |= 1; x &= 0xFFF;
      out[0] = x;
      out[1] = arr[i++];       /* 2, i -> 2 */
      out[2] = arr[--i];       /* back to 1 -> 2 */
      out[3] = *p++;           /* 1 */
      out[4] = *p;             /* 2 */
      p += 2; out[5] = *p;     /* 4 */
    """, 6))
    x = 100
    x += 5; x -= 2; x *= 3; x //= 2; x <<= 1; x ^= 0xF0; x |= 1; x &= 0xFFF
    assert words(res.journal) == [x, 2, 2, 1, 2, 4]


def test_unsupported_features_error():
    with pytest.raises(CompileError):
        compile_c([HDR + "int main(void){ unsigned long long x = 1; "
                   "return (int)x; }"])
    with pytest.raises(CompileError):
        compile_c([HDR + "struct S { int a; }; "
                   "struct S f(void); int main(void){ return 0; }"
                   "struct S f(void){ struct S s; s.a = 1; return s; }"])


def test_prove_c_guest_segment(tmp_path):
    """End-to-end: a C guest proven by the real STARK prover (CPU mesh)."""
    from zeth_tpu import zkvm
    from zeth_tpu.executor import compute_image_id

    src = HDR + """
    static uint32_t out[1];
    int main(void) {
      uint32_t i, s = 0;
      for (i = 0; i < 50; i++) s = s * 31 + i;
      out[0] = s;
      env_commit(out, 4); return 0; }
    """
    elf = compile_c([src, LIB])
    env = zkvm.ExecutorEnv.builder().segment_limit_po2(13).build()
    info = zkvm.LocalProver().prove(env, elf)
    info.receipt.verify(compute_image_id(elf))
    s = 0
    for i in range(50):
        s = (s * 31 + i) & 0xFFFFFFFF
    assert info.receipt.journal == s.to_bytes(4, "little")
