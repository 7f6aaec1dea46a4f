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

CHAL = np.array([[999999937, 3, 1, 4], [123456789, 7, 2, 1],
                 [55555333, 11, 5, 8], [77777177, 2, 9, 3],
                 [44440443, 17, 6, 2], [31313131, 5, 1, 7],
                 [27272727, 13, 4, 9]], dtype=np.uint64)


def _boundary_extra(seg, g4=None, g5=None):
    """The paging-bound d0/d1 sums for a segment's boundary lists (what
    the companion paging proof's publics carry in production)."""
    from zeth_tpu import hostmath as H
    from zeth_tpu.circuits.rv32im import _list_sum
    g4 = H.ext(np.asarray(CHAL[4] if g4 is None else g4, np.uint64))
    g5p = H.ext_powers(
        H.ext(np.asarray(CHAL[5] if g5 is None else g5, np.uint64)), 3)
    init = [(int(a), int(v)) for a, v in zip(seg.mem_addrs, seg.mem_pre)]
    fin = [(int(a), int(v)) for a, v in zip(seg.mem_addrs, seg.mem_post)]
    return {"d0": _list_sum(init, g4, g5p), "d1": _list_sum(fin, g4, g5p)}


def _chain_paging_pubs(ia, iw, segments):
    """Chain-check-only paging publics (roots from a host tree replay;
    challenge/d fields zeroed — verify_chain only reads the roots)."""
    from zeth_tpu.circuits import paging as PGm
    from zeth_tpu.hash.pagetree import SparsePageTree
    tree = SparsePageTree(ia, iw)
    z4 = np.zeros(4, np.uint64)
    out = []
    for seg in segments:
        res = PGm.segment_witness(tree, seg.mem_addrs, seg.mem_pre,
                                  seg.mem_post)
        r0, r1 = res[5], res[6]
        out.append(PGm.PagingAir.pack_publics(z4, z4, r0, r1, z4, z4))
    return out


def _witness(elf, inp=b""):
    entry, ia, iw = load_image(elf)
    res = Executor(elf, input_bytes=inp, trace=True).run()
    seg = res.segments[0]
    air = Rv32imAir(ia, iw)
    po2 = choose_po2(seg, len(ia))
    main, pubs = air.witgen(seg, po2)
    ctrl = air.control_trace(po2)
    air._test_extra = _boundary_extra(seg)
    return air, ctrl, main, pubs


def _aux(air, main, pubs, extra=None):
    extra = extra if extra is not None else air._test_extra
    chal_all = np.concatenate(
        [CHAL, np.asarray(air.derived_challenges(pubs, CHAL, extra=extra),
                          np.uint64)])
    return air.build_aux(main.astype(np.uint64), chal_all)


def _check(air, ctrl, main, pubs, aux=None, extra=None):
    extra = extra if extra is not None else air._test_extra
    if aux is None:
        aux = _aux(air, main, pubs, extra)
    return check_constraints(air, ctrl, main, aux, pubs, CHAL,
                             derived_extra=extra)


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
    bad = list(pubs)
    bad[2] = (bad[2] + 4) & 0xFFFF
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
        po2 = choose_po2(seg, len(ia))
        main, pubs = air.witgen(seg, po2)
        ctrl = air.control_trace(po2)
        air._test_extra = _boundary_extra(seg)
        assert (seg.entry_regs != 0).any()
        assert _check(air, ctrl, main, pubs) == {}


def test_forged_exit_register_public_detected():
    """The public exit-register list is bound in-circuit (d7 RLC over
    REGFIN rows): forging a limb breaks the A_RRX chain constraint."""
    from zeth_tpu.circuits.rv32im import parse_publics
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    pp = parse_publics(pubs)
    assert any(v != 0 for v in pp["exit_regs"])
    k = next(i for i, v in enumerate(pp["exit_regs"]) if v != 0)
    bad = list(pubs)
    bad[13 + 64 + 2 * k] ^= 1        # low limb of exit reg k
    assert _check(air, ctrl, main, bad) != {}


def test_forged_exit_register_witness_detected():
    """Tampering the committed exit value on a REGFIN row breaks either
    the register LogUp (read must match last write) or the d7 chain."""
    from zeth_tpu.circuits.rv32im import CLASS_IDX
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    rf = np.where(main[:, LAYOUT.idx("sel", CLASS_IDX["REGFIN"])] == 1)[0]
    assert len(rf) == 32
    main[rf[5], LAYOUT.idx("rs1v", 0)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_dropped_regfin_run_detected():
    """Re-classing the REGFIN rows as PAD (hiding the exit read-out)
    violates the tail ordering: PAD may only start after REGFIN row 31."""
    from zeth_tpu.circuits.rv32im import CLASS_IDX
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    rf = np.where(main[:, LAYOUT.idx("sel", CLASS_IDX["REGFIN"])] == 1)[0]
    main[rf, LAYOUT.idx("sel", CLASS_IDX["REGFIN"])] = 0
    main[rf, LAYOUT.idx("sel", CLASS_IDX["PAD"])] = 1
    for j in range(5):
        main[rf, LAYOUT.idx("rf_idx", j)] = 0
    assert _check(air, ctrl, main, pubs) != {}


def test_register_discontinuity_detected_by_chain():
    """verify_chain rejects a segment chain whose entry registers do not
    match the previous segment's exit registers."""
    import hashlib
    from zeth_tpu.circuits.rv32im import (Rv32imAir, choose_po2,
                                          verify_chain)
    from zeth_tpu.zkvm import ReceiptClaim, VerificationError
    elf = guests.spin(30000)
    entry, ia, iw = load_image(elf)
    res = Executor(elf, segment_po2=13, trace=True).run()
    assert len(res.segments) >= 2
    air = Rv32imAir(ia, iw)
    publics_list = []
    for seg in res.segments:
        po2 = choose_po2(seg, len(ia))
        _, pubs = air.witgen(seg, po2)
        publics_list.append(pubs)
    claim = ReceiptClaim(
        image_id=np.zeros(8, np.uint64), exit_code=0,
        journal_digest=hashlib.sha256(res.journal).digest())
    pg_pubs = _chain_paging_pubs(ia, iw, res.segments)
    verify_chain(publics_list, claim, ia, iw, entry,
                 paging_publics_list=pg_pubs)    # sanity: passes
    # forge segment 1's entry a1 (claim the register was zeroed)
    bad = [list(p) for p in publics_list]
    k = next((i for i, v in enumerate(
        np.asarray(res.segments[1].entry_regs)) if v != 0), None)
    assert k is not None
    bad[1][13 + 2 * k] ^= 1
    with pytest.raises(VerificationError):
        verify_chain(bad, claim, ia, iw, entry,
                     paging_publics_list=pg_pubs)
    # and a broken page-root chain is rejected too
    bad_pg = [list(p) for p in pg_pubs]
    bad_pg[1][16] ^= 1          # segment 1 pre_root limb
    with pytest.raises(VerificationError):
        verify_chain(publics_list, claim, ia, iw, entry,
                     paging_publics_list=bad_pg)


def test_forged_register_read_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    from zeth_tpu.circuits.rv32im import N_INIT_ROWS
    main[N_INIT_ROWS + 10, LAYOUT.idx("rs1v", 0)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_register_write_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    op_rows = np.where(main[:, LAYOUT.idx("sel", 8)] == 1)[0]
    main[op_rows[0], LAYOUT.idx("res", 2)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_init_register_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    main[5, LAYOUT.idx("res", 0)] ^= 1   # init row of x5
    assert _check(air, ctrl, main, pubs) != {}


def test_dropped_sorted_write_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(50))
    done = False
    for r in range(main.shape[0]):
        for u in range(4):
            if (main[r, LAYOUT.idx("m_act", u)] == 1
                    and main[r, LAYOUT.idx("m_wr", u)] == 1):
                main[r, LAYOUT.idx("m_act", u)] = 0
                done = True
                break
        if done:
            break
    assert done
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_mul_result_detected():
    air, ctrl, main, pubs = _witness(guests.muldiv_check())
    mrows = np.where(main[:, LAYOUT.idx("is_m")] == 1)[0]
    assert len(mrows) >= 4
    main[mrows[0], LAYOUT.idx("res", 5)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


# -- RAM (data-memory) argument ----------------------------------------------


def _first_class_row(main, name):
    from zeth_tpu.circuits.rv32im import CLASS_IDX
    rows = np.where(main[:, LAYOUT.idx("sel", CLASS_IDX[name])] == 1)[0]
    assert len(rows), f"no {name} rows"
    return rows[0]


def test_load_store_guest_satisfies_constraints():
    air, ctrl, main, pubs = _witness(guests.load_store(4))
    assert _check(air, ctrl, main, pubs) == {}


def test_forged_load_value_detected():
    # flip one loaded word bit (and the dependent result bit) — the
    # sorted-trace read rule must reject it
    air, ctrl, main, pubs = _witness(guests.load_store(4))
    r = _first_class_row(main, "LOAD")
    main[r, LAYOUT.idx("mword", 3)] ^= 1
    main[r, LAYOUT.idx("res", 3)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_store_merge_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(20))
    r = _first_class_row(main, "STORE")
    main[r, LAYOUT.idx("mwnew", 5)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_syscall_write_detected():
    # flip one input-stream SYSMEM write value without fixing the sorted
    # trace: the memory multiset argument must reject it
    air, ctrl, main, pubs = _witness(guests.echo_input(8), bytes(range(8)))
    r = _first_class_row(main, "SYSMEM")
    main[r, LAYOUT.idx("mwnew", 0)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_forged_meminit_value_detected():
    # tamper a MEMINIT row's value AND the paging-bound d0 consistently
    # (as a malicious paging-side claim would): the sorted trace still
    # carries the honest first-read, so the multiset argument rejects
    import copy
    from zeth_tpu import hostmath as H
    air, ctrl, main, pubs = _witness(guests.echo_input(8), bytes(range(8)))
    r = _first_class_row(main, "MEMINIT")
    main[r, LAYOUT.idx("mwnew", 1)] ^= 1
    # recompute d0 from the tampered MEMINIT rows
    from zeth_tpu.circuits.rv32im import CLASS_IDX, _list_sum
    rows = np.where(main[:, LAYOUT.idx("sel", CLASS_IDX["MEMINIT"])])[0]
    entries = []
    for rr in rows:
        wa = sum(int(main[rr, LAYOUT.idx("maddr", j)]) << j
                 for j in range(32))
        v = sum(int(main[rr, LAYOUT.idx("mwnew", j)]) << j
                for j in range(32))
        entries.append((wa, v))
    extra = dict(air._test_extra)
    extra["d0"] = _list_sum(entries, H.ext(CHAL[4]),
                            H.ext_powers(H.ext(CHAL[5]), 3))
    assert _check(air, ctrl, main, pubs, extra=extra) != {}


def test_forged_journal_public_detected():
    # commit guest: tampering the public journal words changes the
    # derived RLC, which no longer matches the in-circuit chain
    air, ctrl, main, pubs = _witness(guests.sum_loop(20))
    pp_bad = list(pubs)
    joff = 13 + 128          # first journal limb (header + reg lists)
    assert pp_bad[9] > 0    # journal word count
    pp_bad[joff] ^= 1
    assert _check(air, ctrl, main, pp_bad) != {}


def test_forged_halted_flag_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(20))
    bad = list(pubs)
    bad[4] = 0          # claim "did not halt"
    assert _check(air, ctrl, main, bad) != {}


def test_forged_exit_code_detected():
    air, ctrl, main, pubs = _witness(guests.sum_loop(20))
    bad = list(pubs)
    bad[5] = (bad[5] + 1) & 0xFFFF
    assert _check(air, ctrl, main, bad) != {}


def test_forged_signed_div_result_detected():
    from zeth_tpu.circuits.rv32im import CLASS_IDX
    air, ctrl, main, pubs = _witness(guests.muldiv_check())
    f3_4 = LAYOUT.idx("f3_sel", 4)
    rows = np.where((main[:, LAYOUT.idx("is_m")] == 1)
                    & (main[:, f3_4] == 1)
                    & (main[:, LAYOUT.idx("div_en")] == 1))[0]
    assert len(rows)   # DIV INT_MIN / -1
    main[rows[0], LAYOUT.idx("res", 7)] ^= 1
    assert _check(air, ctrl, main, pubs) != {}


def test_parse_publics_roundtrip():
    from zeth_tpu.circuits.rv32im import parse_publics
    air, ctrl, main, pubs = _witness(guests.echo_input(8), bytes(range(8)))
    pp = parse_publics(pubs)
    assert pp["halted"] == 1 and pp["exit_code"] == 0
    assert pp["n_mem"][0] == pp["n_mem"][1]
    assert len(pp["entry_regs"]) == 32 and len(pp["exit_regs"]) == 32
    assert len(pp["journal_words"]) == 2   # 8 bytes committed
    with pytest.raises(ValueError):
        parse_publics(pubs[:-1])


def test_forged_divu_result_and_remainder_detected():
    air, ctrl, main, pubs = _witness(guests.muldiv_check())
    den = np.where(main[:, LAYOUT.idx("div_en")] == 1)[0]
    dz = np.where(main[:, LAYOUT.idx("div0")] == 1)[0]
    assert len(den) >= 2 and len(dz) >= 2
    m2 = main.copy()
    m2[den[0], LAYOUT.idx("res", 1)] ^= 1
    assert _check(air, ctrl, m2, pubs) != {}
    m3 = main.copy()
    m3[den[0], LAYOUT.idx("mdiv_r", 13)] ^= 1
    assert _check(air, ctrl, m3, pubs) != {}
    m4 = main.copy()
    m4[dz[0], LAYOUT.idx("res", 0)] ^= 1
    assert _check(air, ctrl, m4, pubs) != {}


# -- bigint accelerator syscall binding --------------------------------------


def test_bigint_guest_satisfies_constraints():
    a, b, m = 0xDEADBEEF_CAFEBABE, 0x12345678_9ABCDEF0, (1 << 89) - 1
    air, ctrl, main, pubs = _witness(guests.bigint_guest(a, b, m, reps=2))
    assert _check(air, ctrl, main, pubs) == {}
    from zeth_tpu.circuits.rv32im import parse_publics
    bw = parse_publics(pubs)["bigint_words"]
    assert len(bw) == 96          # 2 calls x 48 words (384-bit width)
    got_r = sum(bw[36 + w] << (32 * w) for w in range(12))
    assert got_r == a * b % m


def test_forged_bigint_result_detected():
    """Flipping a bound result word breaks the in-circuit bigint IO RLC
    against the public list (or, with the public also changed, the
    verifier's host recompute)."""
    a, b, m = 98765, 43210, (1 << 61) - 1
    air, ctrl, main, pubs = _witness(guests.bigint_guest(a, b, m))
    from zeth_tpu.circuits.rv32im import LAYOUT as L, parse_publics
    sm5 = np.where(main[:, L.idx("sm_str", 5)] == 1)[0]
    assert len(sm5) == 12         # 12 write rows (384-bit result)
    row = sm5[0]
    main2 = main.copy()
    main2[row, L.idx("mwnew", 0)] ^= 1
    assert _check(air, ctrl, main2, pubs) != {}
    # forging the public list word too: host recompute catches it
    pp = parse_publics(pubs)
    from zeth_tpu.circuits.rv32im import verify_chain
    from zeth_tpu.zkvm import ReceiptClaim, VerificationError
    import hashlib
    elf = guests.bigint_guest(a, b, m)
    entry, ia, iw = load_image(elf)
    res = Executor(elf, trace=True).run()
    pg_pubs = _chain_paging_pubs(ia, iw, res.segments)
    journal = b"".join(int(w).to_bytes(4, "little")
                       for w in pp["journal_words"])
    claim = ReceiptClaim(
        image_id=np.zeros(8, np.uint64), exit_code=0,
        journal_digest=hashlib.sha256(journal).digest())
    verify_chain([pubs], claim, ia, iw, entry,
                 paging_publics_list=pg_pubs)     # sanity: passes
    bad = list(pubs)
    # locate the first result limb in the flat publics (parse order:
    # 13-scalar header, 2x32-word register lists, then 2-limb word lists)
    n_j, n_k = len(pp["journal_words"]), len(pp["keccak_words"])
    off = 13 + 2 * 64 + 2 * (n_j + n_k) + 2 * 36
    bad[off] ^= 1                 # low limb of the first result word
    with pytest.raises(VerificationError):
        verify_chain([bad], claim, ia, iw, entry,
                     paging_publics_list=pg_pubs)


# -- sha-256 accelerator syscall binding --------------------------------------


def test_sha256_guest_satisfies_constraints():
    from zeth_tpu.hash.sha256 import IV
    air, ctrl, main, pubs = _witness(
        guests.sha256_guest(list(IV), list(range(16)), reps=2))
    assert _check(air, ctrl, main, pubs) == {}
    from zeth_tpu.circuits.rv32im import _sha_compress_words, parse_publics
    sw = parse_publics(pubs)["sha_words"]
    assert len(sw) == 64          # 2 calls x 32 words
    assert sw[24:32] == _sha_compress_words(sw[:8], sw[8:24])


def test_forged_sha_result_detected():
    from zeth_tpu.hash.sha256 import IV
    air, ctrl, main, pubs = _witness(
        guests.sha256_guest(list(IV), [7] * 16))
    from zeth_tpu.circuits.rv32im import LAYOUT as L
    sm7 = np.where(main[:, L.idx("sm_str", 7)] == 1)[0]
    assert len(sm7) == 8
    main2 = main.copy()
    main2[sm7[0], L.idx("mwnew", 0)] ^= 1
    assert _check(air, ctrl, main2, pubs) != {}


def test_build_aux_device_matches_host():
    """The device aux builder (rv32im._build_aux_jit) is bit-identical to
    the host build_aux oracle on a real traced segment."""
    from zeth_tpu.zkp.prover import all_challenges

    elf = guests.echo_input(16)
    entry, ia, iw = load_image(elf)
    res = Executor(elf, bytes(range(16)), segment_po2=12, trace=True).run()
    seg = res.segments[0]
    air = Rv32imAir(ia, iw)
    po2 = choose_po2(seg, len(ia))
    main_std, publics = air.witgen(seg, po2)
    ctrl = air.control_trace(po2)
    rng = np.random.default_rng(3)
    chals = rng.integers(1, 2**31 - 1,
                         size=(air.n_challenges, 4)).astype(np.uint64)
    ch = all_challenges(air, publics, chals,
                        _boundary_extra(seg, g4=chals[4], g5=chals[5]))
    host_aux = np.asarray(air.build_aux(np.asarray(main_std, np.uint64), ch),
                          np.uint64) % np.uint64(P)
    dev_main = jnp.asarray(np.asarray(main_std, np.uint64).astype(np.uint32))
    dev_ctrl = jnp.asarray(np.asarray(ctrl, np.uint64).astype(np.uint32))
    dev_aux = np.asarray(F.from_monty(
        air.build_aux_device(dev_main, dev_ctrl, ch))).astype(np.uint64)
    assert np.array_equal(host_aux, dev_aux % np.uint64(P))
