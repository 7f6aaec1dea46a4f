"""C++ RV32IM executor: ISA semantics, syscalls, segmentation, paging."""

import numpy as np
import pytest

from zeth_tpu.executor import (PAGE_CYCLES, Executor, compute_image_id,
                               guests)
from zeth_tpu.hash import keccak


def test_sum_loop_journal_and_cycles():
    n = 1000
    res = Executor(guests.sum_loop(n)).run()
    assert res.exit_code == 0
    assert int.from_bytes(res.journal, "little") == n * (n + 1) // 2
    # 3 cycles per iteration plus small prologue/epilogue
    assert 3 * n <= res.user_cycles <= 3 * n + 40
    assert res.paging_cycles > 0


def test_echo_input():
    data = bytes(range(256)) * 3
    res = Executor(guests.echo_input(len(data)), input_bytes=data).run()
    assert res.journal == data


def test_muldiv_edge_cases():
    res = Executor(guests.muldiv_check()).run()
    w = np.frombuffer(res.journal, dtype="<u4")
    a, b = 0x12345678, 0x9ABCDEF0
    sa, sb = a, b - (1 << 32)          # b is negative as signed
    assert w[0] == (a * b) & 0xFFFFFFFF                      # MUL
    assert w[1] == ((sa * sb) >> 32) & 0xFFFFFFFF            # MULH
    assert w[2] == (a * b) >> 32                             # MULHU
    assert w[3] == ((sa * b) >> 32) & 0xFFFFFFFF             # MULHSU
    assert w[4] == 0x80000000                                # INT_MIN / -1
    assert w[5] == 0                                         # INT_MIN % -1
    assert w[6] == 0xFFFFFFFF                                # div by 0
    assert w[7] == 0xFFFFFFFF                                # divu by 0
    assert w[8] == 0x80000000                                # remu by 0 = rs1
    assert w[9] == 0xDEADBEEF // 0x1234                      # divu
    assert w[10] == 0xDEADBEEF % 0x1234                      # remu


def test_keccak_syscall_matches_reference():
    res = Executor(guests.keccak_guest(1)).run()
    want = keccak.permute_np(np.zeros((1, 25), dtype=np.uint64))[0]
    assert res.journal == int(want[0]).to_bytes(8, "little")
    assert res.keccak_calls == 1


def test_keccak_call_count():
    res = Executor(guests.keccak_guest(7)).run()
    assert res.keccak_calls == 7


def test_segmentation_splits_and_preserves_semantics():
    # ~90k user cycles with po2=14 (16384-cycle segments) -> several segments
    elf = guests.spin(90_000)
    res_one = Executor(elf, segment_po2=20).run()
    res_seg = Executor(elf, segment_po2=14).run()
    assert res_one.exit_code == res_seg.exit_code == 0
    assert res_seg.user_cycles == res_one.user_cycles
    assert len(res_seg.segments) > 3
    limit = 1 << 14
    for seg in res_seg.segments:
        assert seg.user_cycles + seg.paging_cycles <= limit


def test_paging_cycles_scale_with_pages_touched():
    r4 = Executor(guests.memory_stress(4)).run()
    r20 = Executor(guests.memory_stress(20)).run()
    # each fresh page costs one paging-circuit slot, charged at first touch
    delta = r20.paging_cycles - r4.paging_cycles
    assert delta == 16 * PAGE_CYCLES


def test_image_id_distinguishes_guests():
    id1 = compute_image_id(guests.sum_loop(10))
    id2 = compute_image_id(guests.sum_loop(11))
    id3 = compute_image_id(guests.sum_loop(10))
    assert (id1 == id3).all()
    assert (id1 != id2).any()


def test_trace_records():
    res = Executor(guests.sum_loop(5), trace=True).run()
    tr = res.segments[0].trace
    assert tr is not None and tr.shape[1] == 8
    assert tr.shape[0] == res.segments[0].user_cycles
    # first record: li t0, 0 -> addi x5, x0, 0
    assert tr[0, 0] == 0x10000


def test_guest_fault_raises():
    from zeth_tpu.executor.assembler import Asm
    from zeth_tpu.executor.elf import write_elf
    a = Asm(org=0x10000)
    a.word(0xFFFFFFFF)  # illegal instruction
    elf = write_elf([(a.org, a.assemble())], a.org)
    with pytest.raises(RuntimeError):
        Executor(elf).run()
