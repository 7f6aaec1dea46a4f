"""RV32IM circuit: witgen satisfies constraints; tampering is caught.

The full prove/verify path is exercised in test_zkvm_e2e.py; these tests
use the trace-domain constraint checker (fast, no proving)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zeth_tpu import field as F
from zeth_tpu.field import P
from zeth_tpu.circuits.rv32im import LAYOUT, Rv32imAir, choose_po2
from zeth_tpu.executor import Executor, guests, load_image
from zeth_tpu.zkp.air import check_constraints

CHAL = np.array([[999999937, 3, 0, 0], [123456789, 7, 0, 0],
                 [55555333, 0, 0, 0], [77777177, 0, 0, 0]], dtype=np.uint64)


def _witness(elf, inp=b""):
    entry, ia, iw = load_image(elf)
    res = Executor(elf, input_bytes=inp, trace=True).run()
    seg = res.segments[0]
    air = Rv32imAir(ia, iw)
    po2 = choose_po2(seg.trace.shape[0], len(ia))
    main, pubs = air.witgen(seg.trace, po2, seg.exit_pc, seg.entry_regs)
    ctrl = air.control_trace(po2)
    return air, ctrl, main, pubs


def _aux(air, main):
    monty = ((main.astype(np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)
    return np.asarray(F.from_monty(air.build_aux(jnp.asarray(monty), CHAL))
                      ).astype(np.uint64)


def _check(air, ctrl, main, pubs):
    return check_constraints(air, ctrl, main, _aux(air, main), pubs, CHAL)


@pytest.mark.parametrize("name,elf,inp", [
    ("sum", guests.sum_loop(200), b""),
    ("echo", guests.echo_input(64), bytes(range(64))),
    ("muldiv", guests.muldiv_check(), b""),
    ("keccak", guests.keccak_guest(2), b""),
    ("memstress", guests.memory_stress(6), b""),
    ("spin", guests.spin(700), b""),
])
def test_witness_satisfies_constraints(name, elf, inp):
    air, ctrl, main, pubs = _witness(elf, inp)
    assert _check(air, ctrl, main, pubs) == {}


def test_tampered_result_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    op_rows = np.where(main[:, LAYOUT.idx("sel", 8)] == 1)[0]
    main[op_rows[0], LAYOUT.idx("res", 3)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_tampered_pc_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    main[5, LAYOUT.idx("pc", 2)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_tampered_insn_detected_by_rom_lookup():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    main[3, LAYOUT.idx("insn", 1)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_wrong_exit_pc_public_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    bad = [pubs[0], pubs[1], (pubs[2] + 4) & 0xFFFF, pubs[3]]
    assert _check(air, ctrl, main, bad) != {}


def test_skipped_branch_detected():
    # flip the 'taken' bit on a branch row (and fix up nothing else)
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    br = np.where(main[:, LAYOUT.idx("sel", 4)] == 1)[0]
    main[br[0], LAYOUT.idx("taken")] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


# -- register-file memory argument -------------------------------------------


def test_multisegment_continuation_with_live_registers():
    elf = guests.spin(30000)
    entry, ia, iw = load_image(elf)
    res = Executor(elf, segment_po2=13, trace=True).run()
    assert len(res.segments) >= 3
    for seg in res.segments[1:3]:   # continuation segments: nonzero regs
        air = Rv32imAir(ia, iw)
        po2 = choose_po2(seg.trace.shape[0], len(ia))
        main, pubs = air.witgen(seg.trace, po2, seg.exit_pc, seg.entry_regs)
        ctrl = air.control_trace(po2)
        assert (seg.entry_regs != 0).any()
        assert check_constraints(air, ctrl, main, _aux(air, main),
                                 pubs, CHAL) == {}


def test_forged_register_read_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    from zeth_tpu.circuits.rv32im import N_INIT_ROWS
    main[N_INIT_ROWS + 10, LAYOUT.idx("rs1v", 0)] ^= 1
    assert check_constraints(air, ctrl, main, _aux(air, main),
                             pubs, CHAL) != {}


def test_forged_register_write_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    op_rows = np.where(main[:, LAYOUT.idx("sel", 8)] == 1)[0]
    main[op_rows[0], LAYOUT.idx("res", 2)] ^= 1
    assert check_constraints(air, ctrl, main, _aux(air, main),
                             pubs, CHAL) != {}


def test_forged_init_register_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    main[5, LAYOUT.idx("res", 0)] ^= 1   # init row of x5
    assert check_constraints(air, ctrl, main, _aux(air, main),
                             pubs, CHAL) != {}


def test_dropped_sorted_write_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    done = False
    for r in range(main.shape[0]):
        for u in range(3):
            if (main[r, LAYOUT.idx("m_act", u)] == 1
                    and main[r, LAYOUT.idx("m_wr", u)] == 1):
                main[r, LAYOUT.idx("m_act", u)] = 0
                done = True
                break
        if done:
            break
    assert done
    assert check_constraints(air, ctrl, main, _aux(air, main),
                             pubs, CHAL) != {}


def test_forged_mul_result_detected():
    air, ctrl, main, pubs = _witness(guests.muldiv_check())
    mrows = np.where(main[:, LAYOUT.idx("is_m")] == 1)[0]
    assert len(mrows) >= 4
    main[mrows[0], LAYOUT.idx("res", 5)] ^= 1
    assert check_constraints(air, ctrl, main, _aux(air, main),
                             pubs, CHAL) != {}


def test_forged_divu_result_and_remainder_detected():
    air, ctrl, main, pubs = _witness(guests.muldiv_check())
    den = np.where(main[:, LAYOUT.idx("div_en")] == 1)[0]
    dz = np.where(main[:, LAYOUT.idx("div0")] == 1)[0]
    assert len(den) >= 2 and len(dz) >= 2
    m2 = main.copy()
    m2[den[0], LAYOUT.idx("res", 1)] ^= 1
    assert check_constraints(air, ctrl, m2, _aux(air, m2), pubs, CHAL) != {}
    m3 = main.copy()
    m3[den[0], LAYOUT.idx("mdiv_r", 13)] ^= 1
    assert check_constraints(air, ctrl, m3, _aux(air, m3), pubs, CHAL) != {}
    m4 = main.copy()
    m4[dz[0], LAYOUT.idx("res", 0)] ^= 1
    assert check_constraints(air, ctrl, m4, _aux(air, m4), pubs, CHAL) != {}
