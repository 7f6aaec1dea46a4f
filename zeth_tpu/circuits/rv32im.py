"""RV32IM execution circuit (AIR) v1: prove executor segments on device.

TPU-native re-design of risc0-circuit-rv32im's role (SURVEY.md §2.2):
the C++ executor (zeth_tpu.executor) emits per-cycle trace records; the
numpy witgen here expands them into bit-decomposed witness columns; the
generic DEEP-ALI prover (zeth_tpu.zkp) proves the constraint system.

Covered by constraints in v1:
- program binding: every non-padding row's (pc, insn) pair is looked up
  (LogUp fraction-sum argument in the aux group) in the public program
  ROM carried by the control group; the ROM is bound to the image ID.
- pc flow: one generic 32-bit adder constrains next-pc for every class
  (sequential +4, JAL/JALR targets, taken/untaken branches, frozen pc in
  padding rows), with carry columns and bit-decomposed pc.
- full ALU: ADD/SUB/ADDI, AND/OR/XOR(I), shifts (one-hot shamt unit),
  SLT(U)/SLTI(U) via a shared compare unit, LUI/AUIPC, JAL/JALR link
  values, branch conditions (BEQ/BNE/BLT(U)/BGE(U)).
- segment boundary publics: entry pc and exit pc.

Documented v1 gaps (tracked for later rounds; the reference closes these
with its memory/paging argument):
- the register file IS consistency-checked (sorted access trace + LogUp
  multiset equality + segment-entry init rows); loads still return
  unconstrained witness values and stores are uncommitted (the RAM
  argument needs executor-side access-event streaming for syscall
  memory effects — round 2).
- MUL/MULH/MULHSU/MULHU are fully constrained (8-bit-limb partial
  products with range-checked carries, signed-high adjustment), and
  DIVU/REMU verify q*b + r = a with r < b and the b == 0 special cases;
  signed DIV/REM results remain unconstrained witness values.
- ecall effects are unconstrained (journal/input binding via the claim
  is host-side only).

Max constraint degree: 4 (the prover's limit).
"""

from __future__ import annotations

import numpy as np

from .. import hostmath as H
from ..field import P
from ..zkp import proof as proof_mod
from ..zkp import prover as prover_mod
from ..zkp import verifier as verifier_mod
from ..zkp.air import Air

# instruction classes (selector layout); PAD = rows after halt
CLASSES = [
    ("LUI", 0x37), ("AUIPC", 0x17), ("JAL", 0x6F), ("JALR", 0x67),
    ("BRANCH", 0x63), ("LOAD", 0x03), ("STORE", 0x23), ("OPIMM", 0x13),
    ("OP", 0x33), ("SYSTEM", 0x73), ("FENCE", 0x0F), ("PAD", 0x00),
    ("INIT", 0x00),   # rows 0..31: register-file init writes (one per reg)
]
NCLASS = len(CLASSES)
CLASS_IDX = {name: i for i, (name, _) in enumerate(CLASSES)}

N_INIT_ROWS = 32     # one register-init write row per register
ORD_BITS = 24        # sorted-order diffs (ts = 3*cycle+unit < 3*2^21)
# classes whose result is written back to rd
WB_CLASSES = ("LUI", "AUIPC", "JAL", "JALR", "OPIMM", "OP", "LOAD")


class Layout:
    """Named main-column index ranges."""

    def __init__(self):
        self.n = 0
        self.slices: dict[str, slice] = {}
        for name, width in [
            ("pc", 32), ("insn", 32), ("rs1v", 32), ("rs2v", 32),
            ("res", 32), ("sel", NCLASS), ("f3_sel", 8),
            ("cmp_d", 32), ("cmp_c1", 1), ("cmp_lt", 1),
            ("eq_lo", 1), ("eq_hi", 1), ("eq_inv_lo", 1), ("eq_inv_hi", 1),
            ("sh_sel", 32),
            ("alu_c1", 1), ("alu_c2", 1),
            ("npc_c1", 1), ("npc_c2", 1),
            ("jalr_lsb", 1), ("taken", 1), ("sub", 1), ("op_alu", 1),
            ("rom_m", 1),
            # register-file memory argument: rd != 0 helper + the sorted
            # access trace (3 units per row, sorted by (reg, cycle, unit))
            ("rd_nz", 1), ("rd_inv", 1),
            ("m_reg", 3), ("m_cyc", 3), ("m_vlo", 3), ("m_vhi", 3),
            ("m_wr", 3), ("m_act", 3), ("m_same", 3), ("g_rw", 3),
            ("ord_bits", 3 * ORD_BITS),
            # M-extension multiply unit: committed high word, 8-bit-limb
            # carry chain (7 carries x 12 bits), signed-adjust borrows
            ("is_m", 1), ("mula", 32), ("mullo", 32), ("mulhi", 32),
            ("mul_c", 7 * 12), ("madj_k", 4),
            # DIVU/REMU unit: q, r, the range witness t = b-r-1, carries,
            # b==0 detection, and committed gates
            ("mdiv_q", 32), ("mdiv_r", 32), ("mdiv_t", 32),
            ("mdiv_c1", 1), ("mdiv_e1", 1),
            ("bz_lo_eq", 1), ("bz_lo_inv", 1), ("bz_hi_eq", 1),
            ("bz_hi_inv", 1), ("div_en", 1), ("div0", 1),
        ]:
            self.slices[name] = slice(self.n, self.n + width)
            self.n += width

    def idx(self, name: str, k: int = 0) -> int:
        s = self.slices[name]
        assert s.start + k < s.stop
        return s.start + k


LAYOUT = Layout()

# control columns
C_IS_FIRST, C_IS_LAST = 0, 1
C_ROM_ALO, C_ROM_AHI, C_ROM_WLO, C_ROM_WHI = 2, 3, 4, 5
C_CYCLE, C_IS_INIT = 6, 7
N_CONTROL = 8

# aux columns (LogUp): t = fetch term, u = rom term, acc = running sum;
# register argument: 3 unsorted + 3 sorted access terms + running sum
A_T, A_U, A_ACC = 0, 1, 2
A_RU = 3          # unsorted access terms (3)
A_RS = 6          # sorted access terms (3)
A_RACC = 9
N_AUX = 10

# bit lists for immediates: entry is ("b", insn_bit_index) or 0
def _imm_bits(kind: str):
    b = lambda i: ("b", i)
    if kind == "i":
        return [b(20 + j) for j in range(11)] + [b(31)] * 21
    if kind == "u":
        return [0] * 12 + [b(12 + j) for j in range(20)]
    if kind == "j":
        return ([0] + [b(21 + j) for j in range(10)] + [b(20)]
                + [b(12 + j) for j in range(8)] + [b(31)] * 12)
    if kind == "b":
        return ([0] + [b(8 + j) for j in range(4)]
                + [b(25 + j) for j in range(6)] + [b(7)] + [b(31)] * 20)
    raise ValueError(kind)


def _imm_value(kind: str, insn: np.ndarray) -> np.ndarray:
    """Numpy value of the immediate (uint64, as u32)."""
    insn = insn.astype(np.uint64)
    out = np.zeros_like(insn)
    for j, e in enumerate(_imm_bits(kind)):
        if e != 0:
            out += ((insn >> np.uint64(e[1])) & np.uint64(1)) << np.uint64(j)
    return out & np.uint64(0xFFFFFFFF)


class Rv32imAir(Air):
    """AIR for one execution segment of a fixed public program image."""

    control_cols = N_CONTROL
    main_cols = LAYOUT.n
    aux_cols = N_AUX
    n_challenges = 4     # g0/g1: fetch LogUp; g2/g3: register argument

    def __init__(self, image_addrs: np.ndarray, image_words: np.ndarray):
        """image_*: the initial memory image (sorted by address)."""
        self.image_addrs = np.asarray(image_addrs, dtype=np.uint64)
        self.image_words = np.asarray(image_words, dtype=np.uint64)
        import hashlib
        h = hashlib.sha256(
            self.image_addrs.tobytes() + self.image_words.tobytes()).hexdigest()[:16]
        self.name = f"rv32im:{h}"

    # -- control / ROM -----------------------------------------------------

    def control_trace(self, po2: int) -> np.ndarray:
        n = 1 << po2
        assert len(self.image_addrs) <= n, "image larger than segment rows"
        cols = np.zeros((n, N_CONTROL), dtype=np.uint64)
        cols[0, C_IS_FIRST] = 1
        cols[-1, C_IS_LAST] = 1
        k = len(self.image_addrs)
        addrs = np.zeros(n, dtype=np.uint64)
        words = np.zeros(n, dtype=np.uint64)
        addrs[:k] = self.image_addrs
        words[:k] = self.image_words
        if k:
            # pad with fresh distinct addresses so ROM keys stay unique
            top = int(self.image_addrs[-1])
            addrs[k:] = (top + 4 * np.arange(1, n - k + 1)) & 0xFFFFFFFF
        else:
            addrs[:] = 4 * np.arange(n)
        cols[:, C_ROM_ALO] = addrs & 0xFFFF
        cols[:, C_ROM_AHI] = addrs >> np.uint64(16)
        cols[:, C_ROM_WLO] = words & 0xFFFF
        cols[:, C_ROM_WHI] = words >> np.uint64(16)
        cols[:, C_CYCLE] = np.arange(n)
        cols[:N_INIT_ROWS, C_IS_INIT] = 1
        return cols

    # -- witgen ------------------------------------------------------------

    def witgen(self, trace: np.ndarray, po2: int, exit_pc: int,
               entry_regs: np.ndarray | None = None) -> tuple[np.ndarray, list]:
        """Expand executor trace records -> (main_std (n, main_cols), publics).

        trace: (cycles, 8) uint32 [pc, insn, rs1v, rs2v, rdv, maddr, mval, fl]
        exit_pc: machine pc after the segment's last instruction (from the
        executor) — becomes the frozen padding-row pc and the exit public.
        entry_regs: (32,) register file at segment entry (zeros if omitted);
        written by the N_INIT_ROWS leading init rows.

        Row layout: [0, 32) = register init rows; [32, 32+cycles) = executed
        instructions; rest = padding.
        """
        n = 1 << po2
        rows = trace.shape[0]
        B = N_INIT_ROWS
        assert B + rows < n, "need at least one padding row"
        if entry_regs is None:
            entry_regs = np.zeros(32, dtype=np.uint64)
        entry_regs = np.asarray(entry_regs, dtype=np.uint64)
        assert entry_regs[0] == 0
        m = np.zeros((n, LAYOUT.n), dtype=np.uint64)
        L = LAYOUT

        pc = trace[:, 0].astype(np.uint64)
        insn = trace[:, 1].astype(np.uint64)
        rs1v = trace[:, 2].astype(np.uint64)
        rs2v = trace[:, 3].astype(np.uint64)
        rdv = trace[:, 4].astype(np.uint64)

        opcode = insn & np.uint64(0x7F)
        f3 = (insn >> np.uint64(12)) & np.uint64(7)
        b30 = (insn >> np.uint64(30)) & np.uint64(1)
        b25 = (insn >> np.uint64(25)) & np.uint64(1)

        pad_pc = np.uint64(exit_pc & 0xFFFFFFFF)

        def put_bits(name, vals, where=None):
            if where is None:
                where = slice(B, B + rows)
            s = L.slices[name]
            for j in range(s.stop - s.start):
                m[where, s.start + j] = (vals >> np.uint64(j)) & np.uint64(1)

        put_bits("pc", pc)
        put_bits("insn", insn)
        put_bits("rs1v", rs1v)
        put_bits("rs2v", rs2v)
        put_bits("res", rdv)
        m[B + rows:, L.slices["pc"].start:L.slices["pc"].stop] = (
            (pad_pc >> np.arange(32).astype(np.uint64)) & 1)
        # init rows: pc frozen at the entry pc; res carries the incoming
        # register value written by that row's init unit
        entry_pc = np.uint64(int(trace[0, 0]) if rows else int(exit_pc))
        m[:B, L.slices["pc"].start:L.slices["pc"].stop] = (
            (entry_pc >> np.arange(32).astype(np.uint64)) & 1)
        put_bits("res", entry_regs, where=slice(0, B))

        # class selectors
        class_of = np.full(rows, CLASS_IDX["PAD"], dtype=np.int64)
        for name, opc in CLASSES:
            if name == "PAD":
                continue
            class_of[opcode == opc] = CLASS_IDX[name]
        m[B + np.arange(rows), L.idx("sel") + class_of] = 1
        m[B + rows:, L.idx("sel", CLASS_IDX["PAD"])] = 1
        m[:B, L.idx("sel", CLASS_IDX["INIT"])] = 1

        # f3 one-hot (padding rows: f3 = 0)
        m[B + np.arange(rows), L.idx("f3_sel") + f3.astype(np.int64)] = 1
        m[B + rows:, L.idx("f3_sel", 0)] = 1
        m[:B, L.idx("f3_sel", 0)] = 1

        is_cls = {name: class_of == CLASS_IDX[name] for name, _ in CLASSES}

        # compare unit: a = rs1 (hi-flipped if signed), b = imm for OPIMM
        # SLTI/SLTIU else rs2 (hi-flipped if signed)
        imm_i = _imm_value("i", insn)
        signed = ((is_cls["BRANCH"] & ((f3 == 4) | (f3 == 5)))
                  | ((is_cls["OP"] | is_cls["OPIMM"]) & (f3 == 2)))
        use_imm = is_cls["OPIMM"]
        a_cmp = rs1v.copy()
        b_cmp = np.where(use_imm, imm_i, rs2v)
        flip = np.uint64(0x80000000)
        a_cmp = np.where(signed, a_cmp ^ flip, a_cmp)
        b_cmp = np.where(signed, b_cmp ^ flip, b_cmp)
        d = (a_cmp - b_cmp) & np.uint64(0xFFFFFFFF)
        put_bits("cmp_d", d)
        c1 = ((b_cmp & 0xFFFF) + (d & 0xFFFF)) >> np.uint64(16)
        m[B:B + rows, L.idx("cmp_c1")] = c1
        ltu = a_cmp < b_cmp
        m[B:B + rows, L.idx("cmp_lt")] = ltu

        # equality unit (rs1 vs rs2, per 16-bit limb)
        def inv_or_zero(x):
            out = np.zeros_like(x)
            nz = x % P != 0
            out[nz] = _vec_modinv(x[nz] % P)
            return out
        dlo = (rs1v & 0xFFFF).astype(np.int64) - (rs2v & 0xFFFF).astype(np.int64)
        dhi = (rs1v >> np.uint64(16)).astype(np.int64) - (rs2v >> np.uint64(16)).astype(np.int64)
        dlo_f = np.mod(dlo, P).astype(np.uint64)
        dhi_f = np.mod(dhi, P).astype(np.uint64)
        m[B:B + rows, L.idx("eq_lo")] = dlo_f == 0
        m[B:B + rows, L.idx("eq_hi")] = dhi_f == 0
        m[B:B + rows, L.idx("eq_inv_lo")] = inv_or_zero(dlo_f)
        m[B:B + rows, L.idx("eq_inv_hi")] = inv_or_zero(dhi_f)
        m[B + rows:, L.idx("eq_lo")] = 1
        m[:B, L.idx("eq_lo")] = 1
        m[B + rows:, L.idx("eq_hi")] = 1
        m[:B, L.idx("eq_hi")] = 1

        # shift unit
        shamt = np.where(is_cls["OPIMM"], (insn >> np.uint64(20)) & np.uint64(31),
                         np.where(is_cls["OP"], rs2v & np.uint64(31), 0))
        is_shift = ((is_cls["OPIMM"] | (is_cls["OP"] & (b25 == 0)))
                    & ((f3 == 1) | (f3 == 5)))
        shamt = np.where(is_shift, shamt, 0)
        m[B + np.arange(rows), L.idx("sh_sel") + shamt.astype(np.int64)] = 1
        m[B + rows:, L.idx("sh_sel", 0)] = 1
        m[:B, L.idx("sh_sel", 0)] = 1

        # OP-class ALU selector: excludes the M extension (funct7 bit 25)
        op_alu = (is_cls["OP"] & (b25 == 0)).astype(np.uint64)
        m[B:B + rows, L.idx("op_alu")] = op_alu

        # M-extension multiply unit (MUL/MULH/MULHSU/MULHU: f3 in 0..3)
        is_m = (is_cls["OP"] & (b25 == 1)).astype(np.uint64)
        m[B:B + rows, L.idx("is_m")] = is_m
        div_rows = (is_m == 1) & ((f3 == 5) | (f3 == 7))
        mul_rows = ((is_m == 1) & (f3 <= 3)) | div_rows
        if mul_rows.any():
            b_all = rs2v[mul_rows]
            dsel = div_rows[mul_rows]
            bz = b_all == 0
            q = np.where(bz, np.uint64(0xFFFFFFFF),
                         rs1v[mul_rows] // np.maximum(b_all, 1))
            r = np.where(bz, rs1v[mul_rows],
                         rs1v[mul_rows] % np.maximum(b_all, 1))
            # mul-unit A operand: rs1 for multiplies, q for divides
            a = np.where(dsel, q, rs1v[mul_rows])
            b = b_all
            full = a * b                       # < 2^64, fits uint64
            lo = full & np.uint64(0xFFFFFFFF)
            hi = full >> np.uint64(32)
            where = np.where(mul_rows)[0] + B
            for j in range(32):
                m[where, L.idx("mula", j)] = (a >> np.uint64(j)) & np.uint64(1)
            # div side columns
            t = np.where(bz | ~dsel, 0, (b - r - 1) & np.uint64(0xFFFFFFFF))
            for j in range(32):
                m[where, L.idx("mdiv_q", j)] = (q >> np.uint64(j)) & np.uint64(1)
                m[where, L.idx("mdiv_r", j)] = (r >> np.uint64(j)) & np.uint64(1)
                m[where, L.idx("mdiv_t", j)] = (t >> np.uint64(j)) & np.uint64(1)
            # relation carries: qb_lo + r_lo = a_lo + 2^16 c1 (div rows, b!=0)
            c1d = np.where(dsel & ~bz,
                           ((lo & 0xFFFF) + (r & 0xFFFF)) >> np.uint64(16), 0)
            m[where, L.idx("mdiv_c1")] = c1d
            e1 = np.where(dsel & ~bz,
                          ((r & 0xFFFF) + 1 + (t & 0xFFFF)) >> np.uint64(16), 0)
            m[where, L.idx("mdiv_e1")] = e1
            # b == 0 detection per limb
            blo = b & np.uint64(0xFFFF)
            bhi = b >> np.uint64(16)
            m[where, L.idx("bz_lo_eq")] = blo == 0
            m[where, L.idx("bz_hi_eq")] = bhi == 0
            m[where, L.idx("bz_lo_inv")] = inv_or_zero(blo)
            m[where, L.idx("bz_hi_inv")] = inv_or_zero(bhi)
            m[where, L.idx("div_en")] = dsel & ~bz
            m[where, L.idx("div0")] = dsel & bz
            for j in range(32):
                m[where, L.idx("mullo", j)] = (lo >> np.uint64(j)) & np.uint64(1)
                m[where, L.idx("mulhi", j)] = (hi >> np.uint64(j)) & np.uint64(1)
            # carry chain over 8-bit limbs
            al = [(a >> np.uint64(8 * i)) & np.uint64(0xFF) for i in range(4)]
            bl = [(b >> np.uint64(8 * i)) & np.uint64(0xFF) for i in range(4)]
            rl = [(full >> np.uint64(8 * k)) & np.uint64(0xFF) for k in range(8)]
            carry = np.zeros_like(a)
            for k in range(7):
                s = sum(al[i] * bl[k - i]
                        for i in range(max(0, k - 3), min(3, k) + 1))
                t = s + carry
                carry = (t - rl[k]) >> np.uint64(8)
                for j in range(12):
                    m[where, L.idx("mul_c", 12 * k + j)] =                         (carry >> np.uint64(j)) & np.uint64(1)
            # signed-high adjustment borrows for MULH / MULHSU
            f3r = f3[mul_rows]
            a31 = a >> np.uint64(31)
            b31 = b >> np.uint64(31)
            adj_lo = np.zeros_like(a)
            adj_hi = np.zeros_like(a)
            mh = f3r == 1
            adj_lo[mh] = (a31 * (b & 0xFFFF) + b31 * (a & 0xFFFF))[mh]
            adj_hi[mh] = (a31 * (b >> np.uint64(16))
                          + b31 * (a >> np.uint64(16)))[mh]
            ms = f3r == 2
            adj_lo[ms] = (a31 * (b & 0xFFFF))[ms]
            adj_hi[ms] = (a31 * (b >> np.uint64(16)))[ms]
            res_r = rdv[mul_rows]
            k1 = (adj_lo + (res_r & 0xFFFF) - (hi & 0xFFFF)) >> np.uint64(16)
            k1[~(mh | ms)] = 0
            k2 = (adj_hi + (res_r >> np.uint64(16)) + k1
                  - (hi >> np.uint64(16))) >> np.uint64(16)
            k2[~(mh | ms)] = 0
            m[where, L.idx("madj_k", 0)] = k1 & np.uint64(1)
            m[where, L.idx("madj_k", 1)] = k1 >> np.uint64(1)
            m[where, L.idx("madj_k", 2)] = k2 & np.uint64(1)
            m[where, L.idx("madj_k", 3)] = k2 >> np.uint64(1)

        # sub flag and ALU adder carries
        sub = (is_cls["OP"] & (b25 == 0) & (f3 == 0) & (b30 == 1)).astype(np.uint64)
        m[B:B + rows, L.idx("sub")] = sub
        alu_a = np.zeros(rows, dtype=np.uint64)
        alu_b = np.zeros(rows, dtype=np.uint64)
        alu_cin = np.zeros(rows, dtype=np.uint64)
        imm_u = _imm_value("u", insn)
        mm = is_cls["OPIMM"] & (f3 == 0)
        alu_a[mm], alu_b[mm] = rs1v[mm], imm_i[mm]
        mm = is_cls["OP"] & (b25 == 0) & (f3 == 0)
        alu_a[mm] = rs1v[mm]
        alu_b[mm] = np.where(sub[mm] == 1, rs2v[mm] ^ np.uint64(0xFFFFFFFF), rs2v[mm])
        alu_cin[mm] = sub[mm]
        mm = is_cls["AUIPC"]
        alu_a[mm], alu_b[mm] = pc[mm], imm_u[mm]
        mm = is_cls["JAL"] | is_cls["JALR"]
        alu_a[mm], alu_b[mm] = pc[mm], 4
        s_lo = (alu_a & 0xFFFF) + (alu_b & 0xFFFF) + alu_cin
        ac1 = s_lo >> np.uint64(16)
        s_hi = (alu_a >> np.uint64(16)) + (alu_b >> np.uint64(16)) + ac1
        m[B:B + rows, L.idx("alu_c1")] = ac1
        m[B:B + rows, L.idx("alu_c2")] = s_hi >> np.uint64(16)

        # branch taken + next-pc adder
        taken = np.zeros(rows, dtype=np.uint64)
        bm = is_cls["BRANCH"]
        eq = (rs1v == rs2v)
        cond = np.select(
            [f3 == 0, f3 == 1, f3 == 4, f3 == 5, f3 == 6, f3 == 7],
            [eq, ~eq, ltu, ~ltu, ltu, ~ltu], default=False)
        taken[bm] = cond[bm]
        m[B:B + rows, L.idx("taken")] = taken

        imm_j = _imm_value("j", insn)
        imm_b = _imm_value("b", insn)
        jalr_t = (rs1v + imm_i) & np.uint64(0xFFFFFFFF)
        lsb = np.where(is_cls["JALR"], jalr_t & 1, 0).astype(np.int64)
        m[B:B + rows, L.idx("jalr_lsb")] = lsb

        # carries for the generic next-pc adder, in *integer* limb arithmetic
        # (the JALR addend is imm_lo - lsb, which never underflows: lsb <=
        # (rs1_lo + imm_lo) & 1)
        npc_a = np.where(is_cls["JALR"], rs1v, pc)
        b_lo_int = np.select(
            [is_cls["JAL"], is_cls["JALR"], bm],
            [(imm_j & 0xFFFF).astype(np.int64),
             (imm_i & 0xFFFF).astype(np.int64) - lsb,
             np.where(taken == 1, (imm_b & 0xFFFF).astype(np.int64), 4)],
            default=4)
        b_hi_int = np.select(
            [is_cls["JAL"], is_cls["JALR"], bm],
            [(imm_j >> np.uint64(16)).astype(np.int64),
             (imm_i >> np.uint64(16)).astype(np.int64),
             np.where(taken == 1, (imm_b >> np.uint64(16)).astype(np.int64), 0)],
            default=0)
        nc1 = ((npc_a & 0xFFFF).astype(np.int64) + b_lo_int) >> 16
        nhi = (npc_a >> np.uint64(16)).astype(np.int64) + b_hi_int + nc1
        m[B:B + rows, L.idx("npc_c1")] = nc1
        m[B:B + rows, L.idx("npc_c2")] = (nhi >> 16) & 1

        # ROM multiplicities: fetch counts per image address
        rom_m = np.zeros(n, dtype=np.uint64)
        addr_to_row = {int(a): i for i, a in enumerate(self.image_addrs)}
        pcs, counts = np.unique(pc, return_counts=True)
        for a, c in zip(pcs, counts):
            row = addr_to_row.get(int(a))
            if row is None:
                raise ValueError(f"fetch from address 0x{int(a):x} outside image")
            rom_m[row] = c
        m[:, L.idx("rom_m")] = rom_m

        # --- register-file access log + sorted trace ---------------------
        rd_f = (insn >> np.uint64(7)) & np.uint64(31)
        rs1_f = (insn >> np.uint64(15)) & np.uint64(31)
        rs2_f = (insn >> np.uint64(20)) & np.uint64(31)
        m[B:B + rows, L.idx("rd_nz")] = rd_f != 0
        m[B:B + rows, L.idx("rd_inv")] = inv_or_zero(rd_f)

        wb_mask = np.zeros(rows, dtype=bool)
        for name in WB_CLASSES:
            wb_mask |= is_cls[name]
        w_act = (wb_mask & (rd_f != 0)) | is_cls["SYSTEM"]
        w_reg = np.where(is_cls["SYSTEM"], 10, rd_f)

        # entries: (reg, ts, vlo, vhi, wr, act); ts = 3*row + unit
        ex_rows = B + np.arange(rows)
        entries = []
        # init writes (rows 0..31, unit 2)
        entries.append(np.stack([
            np.arange(32, dtype=np.uint64),
            3 * np.arange(32, dtype=np.uint64) + 2,
            entry_regs & np.uint64(0xFFFF), entry_regs >> np.uint64(16),
            np.ones(32, dtype=np.uint64), np.ones(32, dtype=np.uint64)],
            axis=1))
        if rows:
            entries.append(np.stack([
                rs1_f, 3 * ex_rows.astype(np.uint64),
                rs1v & np.uint64(0xFFFF), rs1v >> np.uint64(16),
                np.zeros(rows, dtype=np.uint64),
                np.ones(rows, dtype=np.uint64)], axis=1))
            entries.append(np.stack([
                rs2_f, 3 * ex_rows.astype(np.uint64) + 1,
                rs2v & np.uint64(0xFFFF), rs2v >> np.uint64(16),
                np.zeros(rows, dtype=np.uint64),
                np.ones(rows, dtype=np.uint64)], axis=1))
            entries.append(np.stack([
                w_reg, 3 * ex_rows.astype(np.uint64) + 2,
                rdv & np.uint64(0xFFFF), rdv >> np.uint64(16),
                np.ones(rows, dtype=np.uint64),
                w_act.astype(np.uint64)], axis=1))
        log = np.concatenate(entries, axis=0)
        log = log[log[:, 5] == 1]                     # active only
        order = np.lexsort((log[:, 1], log[:, 0]))    # by (reg, ts)
        log = log[order]
        ne = log.shape[0]
        assert ne <= 3 * n
        for col, name in ((0, "m_reg"), (1, "m_cyc"), (2, "m_vlo"),
                          (3, "m_vhi"), (4, "m_wr"), (5, "m_act")):
            flat = np.zeros(3 * n, dtype=np.uint64)
            flat[:ne] = log[:, col]
            for u in range(3):
                m[:, L.idx(name, u)] = flat[u::3]
        same = np.zeros(3 * n, dtype=np.uint64)
        if ne > 1:
            same[1:ne] = log[1:, 0] == log[:-1, 0]
        ordb = np.zeros(3 * n, dtype=np.uint64)
        if ne > 1:
            d = np.where(same[1:ne] == 1,
                         log[1:, 1] - log[:-1, 1] - 1,
                         log[1:, 0] - log[:-1, 0] - 1)
            ordb[1:ne] = d
        for u in range(3):
            m[:, L.idx("m_same", u)] = same[u::3]
            for j in range(ORD_BITS):
                m[:, L.idx("ord_bits", u * ORD_BITS + j)] =                     (ordb[u::3] >> np.uint64(j)) & np.uint64(1)

        entry_pc_i = int(entry_pc)
        publics = [entry_pc_i & 0xFFFF, entry_pc_i >> 16,
                   int(pad_pc) & 0xFFFF, int(pad_pc) >> 16]
        return m, publics

    # -- aux (LogUp) -------------------------------------------------------

    def build_aux(self, main_monty, challenges):
        import jax.numpy as jnp
        from .. import field as Fdev
        g0 = int(challenges[0][0]) % P
        g1 = int(challenges[1][0]) % P
        main_std = np.asarray(Fdev.from_monty(main_monty)).astype(np.uint64)
        n = main_std.shape[0]
        L = LAYOUT

        def lump(name, lo=True):
            s = L.slices[name]
            bits = main_std[:, s.start:s.stop]
            r = range(0, 16) if lo else range(16, 32)
            return sum((bits[:, j].astype(object) << (j % 16)) for j in r)

        pc_lo = np.array(lump("pc", True), dtype=np.uint64)
        pc_hi = np.array(lump("pc", False), dtype=np.uint64)
        in_lo = np.array(lump("insn", True), dtype=np.uint64)
        in_hi = np.array(lump("insn", False), dtype=np.uint64)
        key_f = (pc_lo + g1 * pc_hi % P + pow(g1, 2, P) * in_lo % P
                 + pow(g1, 3, P) * in_hi % P) % P

        ctrl = self.control_trace(int(np.log2(n)))
        key_r = (ctrl[:, C_ROM_ALO] + g1 * ctrl[:, C_ROM_AHI] % P
                 + pow(g1, 2, P) * ctrl[:, C_ROM_WLO] % P
                 + pow(g1, 3, P) * ctrl[:, C_ROM_WHI] % P) % P

        active = (1 - main_std[:, L.idx("sel", CLASS_IDX["PAD"])]
                  - main_std[:, L.idx("sel", CLASS_IDX["INIT"])])
        rom_m = main_std[:, L.idx("rom_m")]

        inv_f = _vec_modinv((np.uint64(g0) + np.uint64(P) - key_f) % np.uint64(P))
        inv_r = _vec_modinv((np.uint64(g0) + np.uint64(P) - key_r) % np.uint64(P))
        t = active * inv_f % P
        u = rom_m * inv_r % P
        acc = np.cumsum((t.astype(object) - u) % P) % P

        # --- register-file argument terms (challenges g2, g3) -------------
        g2 = int(challenges[2][0]) % P
        g3 = int(challenges[3][0]) % P
        g3p = [1, g3, g3 * g3 % P, pow(g3, 3, P), pow(g3, 4, P)]
        cyc = np.arange(n, dtype=np.uint64)
        sel = lambda nm: main_std[:, L.idx("sel", CLASS_IDX[nm])]
        bits = lambda nm, lo, hi: sum(
            (main_std[:, L.idx(nm, j)] << np.uint64(j - lo))
            for j in range(lo, hi))

        def fp(reg, ts, vlo, vhi, wr):
            return (reg + g3p[1] * ts % P + g3p[2] * vlo % P
                    + g3p[3] * vhi % P + g3p[4] * wr % P) % np.uint64(P)

        def term(fp_vals, act):
            inv = _vec_modinv((np.uint64(g2) + np.uint64(P)
                               - fp_vals % np.uint64(P)) % np.uint64(P))
            return act % np.uint64(P) * inv % np.uint64(P)

        is_init = sel("INIT")
        rs1_f = bits("insn", 15, 20)
        rs2_f = bits("insn", 20, 25)
        rd_f = bits("insn", 7, 12)
        rs1v_lo, rs1v_hi = bits("rs1v", 0, 16), bits("rs1v", 16, 32)
        rs2v_lo, rs2v_hi = bits("rs2v", 0, 16), bits("rs2v", 16, 32)
        res_lo, res_hi = bits("res", 0, 16), bits("res", 16, 32)
        rd_nz = main_std[:, L.idx("rd_nz")]
        wb = sum(sel(nm) for nm in WB_CLASSES)
        w_act = (wb * rd_nz + sel("SYSTEM")) % np.uint64(P)
        w_reg = (wb * rd_nz % P * rd_f + sel("SYSTEM") * 10
                 + is_init * cyc) % np.uint64(P)
        w_act_all = (w_act + is_init) % np.uint64(P)

        t_r1 = term(fp(rs1_f, 3 * cyc, rs1v_lo, rs1v_hi, 0), active)
        t_r2 = term(fp(rs2_f, 3 * cyc + 1, rs2v_lo, rs2v_hi, 0), active)
        t_w = term(fp(w_reg, 3 * cyc + 2, res_lo, res_hi, 1), w_act_all)
        s_terms = []
        for u2 in range(3):
            s_terms.append(term(
                fp(main_std[:, L.idx("m_reg", u2)],
                   main_std[:, L.idx("m_cyc", u2)],
                   main_std[:, L.idx("m_vlo", u2)],
                   main_std[:, L.idx("m_vhi", u2)],
                   main_std[:, L.idx("m_wr", u2)]),
                main_std[:, L.idx("m_act", u2)]))
        delta = (t_r1.astype(object) + t_r2 + t_w
                 - s_terms[0] - s_terms[1] - s_terms[2]) % P
        racc = np.cumsum(delta) % P

        aux = np.stack([t, u, np.array(acc, dtype=np.uint64),
                        t_r1, t_r2, t_w,
                        s_terms[0], s_terms[1], s_terms[2],
                        np.array(racc, dtype=np.uint64)], axis=1)
        monty = ((aux.astype(np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)
        return jnp.asarray(monty)

    # -- constraints -------------------------------------------------------

    def constraints(self, v, ops, publics, challenges):
        L = LAYOUT
        one = ops.const(1)
        g0 = challenges[0]
        g1v = challenges[1]

        def m(name, k=0, off=0):
            return v("main", L.idx(name, k), off)

        def sel(name, off=0):
            return m("sel", CLASS_IDX[name], off)

        def ctl(k, off=0):
            return v("control", k, off)

        add, sub_, mul = ops.add, ops.sub, ops.mul

        def lin(pairs):
            """sum of coeff*expr (coeff python int)."""
            acc = None
            for coeff, e in pairs:
                term = e if coeff == 1 else mul(ops.const(coeff), e)
                acc = term if acc is None else add(acc, term)
            return acc if acc is not None else ops.const(0)

        _lump_cache = {}

        def lump(name, lo, off=0):
            key = (name, lo, off)
            if key not in _lump_cache:
                r = range(0, 16) if lo else range(16, 32)
                _lump_cache[key] = lin(
                    [(1 << (j % 16), m(name, j, off)) for j in r])
            return _lump_cache[key]

        def imm_lump(kind, lo):
            key = ("imm", kind, lo)
            if key not in _lump_cache:
                bits = _imm_bits(kind)
                r = range(0, 16) if lo else range(16, 32)
                pairs = []
                for j in r:
                    e = bits[j]
                    if e != 0:
                        pairs.append((1 << (j % 16), m("insn", e[1])))
                _lump_cache[key] = lin(pairs)
            return _lump_cache[key]

        cs = []

        # --- booleanity ---------------------------------------------------
        bool_cols = (["pc", "insn", "rs1v", "rs2v", "res", "cmp_d", "sh_sel",
                      "sel", "f3_sel"]
                     + ["cmp_c1", "cmp_lt", "eq_lo", "eq_hi", "alu_c1",
                        "alu_c2", "npc_c1", "npc_c2", "jalr_lsb", "taken",
                        "sub", "op_alu", "rd_nz", "m_wr", "m_act", "m_same", "g_rw"]
                     + ["ord_bits", "mula", "mullo", "mulhi", "mul_c", "madj_k",
                        "is_m", "mdiv_q", "mdiv_r", "mdiv_t", "mdiv_c1",
                        "mdiv_e1", "bz_lo_eq", "bz_hi_eq", "div_en",
                        "div0"])
        for name in bool_cols:
            s = L.slices[name]
            for k in range(s.stop - s.start):
                b = m(name, k)
                cs.append(mul(b, sub_(b, one)))

        # --- selectors ----------------------------------------------------
        opc_val = lin([(1 << i, m("insn", i)) for i in range(7)])
        sel_sum = lin([(1, sel(nm)) for nm, _ in CLASSES])
        cs.append(sub_(sel_sum, one))
        for nm, opc in CLASSES:
            if nm == "PAD":
                continue
            cs.append(mul(sel(nm), sub_(opc_val, ops.const(opc))))
        cs.append(mul(sel("PAD"), lump("insn", True)))
        cs.append(mul(sel("PAD"), lump("insn", False)))
        cs.append(mul(sel("INIT"), lump("insn", True)))
        cs.append(mul(sel("INIT"), lump("insn", False)))
        # init rows are exactly the control-designated leading rows
        cs.append(sub_(sel("INIT"), ctl(C_IS_INIT)))
        # padding is terminal (until last row)
        not_last = sub_(one, ctl(C_IS_LAST))
        cs.append(mul(mul(sel("PAD"), sub_(one, sel("PAD", 1))), not_last))

        # f3 one-hot binding
        f3_sum = lin([(1, m("f3_sel", k)) for k in range(8)])
        cs.append(sub_(f3_sum, one))
        f3_idx = lin([(k, m("f3_sel", k)) for k in range(1, 8)])
        f3_val = lin([(1 << (i - 12), m("insn", i)) for i in range(12, 15)])
        cs.append(sub_(f3_idx, f3_val))

        def f3(k, off=0):
            return m("f3_sel", k, off)

        # --- equality unit (rs1 vs rs2 limbs) -----------------------------
        for lo, eqn, invn in ((True, "eq_lo", "eq_inv_lo"),
                              (False, "eq_hi", "eq_inv_hi")):
            diff = sub_(lump("rs1v", lo), lump("rs2v", lo))
            cs.append(mul(m(eqn), diff))
            cs.append(sub_(sub_(one, m(eqn)), mul(diff, m(invn))))
        eq = mul(m("eq_lo"), m("eq_hi"))

        # --- compare unit -------------------------------------------------
        # operands: a = rs1 (hi bit flipped when signed), b = imm (OPIMM) or
        # rs2 (flipped when signed); signed = BRANCH&f3 in {4,5} | (OP|OPIMM)&f3=2
        signed = add(mul(sel("BRANCH"), add(f3(4), f3(5))),
                     mul(add(sel("OP"), sel("OPIMM")), f3(2)))
        use_imm = sel("OPIMM")
        b_lo = add(mul(use_imm, imm_lump("i", True)),
                   mul(sub_(one, use_imm), lump("rs2v", True)))
        b_hi_raw = add(mul(use_imm, imm_lump("i", False)),
                       mul(sub_(one, use_imm), lump("rs2v", False)))
        # flipping bit31 adds (1 - 2*b31)*2^15; bit31 of b depends on operand
        b_b31 = add(mul(use_imm, m("insn", 31)),
                    mul(sub_(one, use_imm), m("rs2v", 31)))
        two15 = ops.const(1 << 15)
        b_hi = add(b_hi_raw, mul(signed,
                   sub_(two15, mul(ops.const(1 << 16), b_b31))))
        a_hi = add(lump("rs1v", False), mul(signed,
                   sub_(two15, mul(ops.const(1 << 16), m("rs1v", 31)))))
        a_lo = lump("rs1v", True)
        two16 = ops.const(1 << 16)
        cs.append(sub_(add(b_lo, lump("cmp_d", True)),
                       add(a_lo, mul(two16, m("cmp_c1")))))
        cs.append(sub_(add(add(b_hi, lump("cmp_d", False)), m("cmp_c1")),
                       add(a_hi, mul(two16, m("cmp_lt")))))
        lt = m("cmp_lt")

        # --- ALU adder (shared carries) -----------------------------------
        def adder(gate, a_lo_e, a_hi_e, b_lo_e, b_hi_e, cin, out="res"):
            cs.append(mul(gate, sub_(add(add(a_lo_e, b_lo_e), cin),
                                     add(lump(out, True),
                                         mul(two16, m("alu_c1"))))))
            cs.append(mul(gate, sub_(add(add(a_hi_e, b_hi_e), m("alu_c1")),
                                     add(lump(out, False),
                                         mul(two16, m("alu_c2"))))))

        # ADDI
        adder(mul(sel("OPIMM"), f3(0)),
              lump("rs1v", True), lump("rs1v", False),
              imm_lump("i", True), imm_lump("i", False), ops.const(0))
        # ADD/SUB: b' = rs2 xor sub (bitwise), cin = sub
        op_alu = m("op_alu")
        cs.append(sub_(op_alu, mul(sel("OP"), sub_(one, m("insn", 25)))))
        is_m = m("is_m")
        cs.append(sub_(is_m, mul(sel("OP"), m("insn", 25))))

        # --- M-extension multiply unit (MUL/MULH/MULHSU/MULHU) ------------
        def limb8(name, k, off_name=None):
            src_name = name
            return lin([(1 << j, m(src_name, 8 * k + j)) for j in range(8)])

        def prod_limbs(k):
            """sum of A_i*b_j with i+j=k (8-bit limbs of mula, rs2v)."""
            acc = None
            for i in range(max(0, k - 3), min(3, k) + 1):
                t2 = mul(limb8("mula", i), limb8("rs2v", k - i))
                acc = t2 if acc is None else add(acc, t2)
            return acc

        def carry_lump(k):
            return lin([(1 << j, m("mul_c", 12 * k + j)) for j in range(12)])

        def lump_of2(name, lo):
            r = range(0, 16) if lo else range(16, 32)
            return lin([(1 << (j % 16), m(name, j)) for j in r])

        def out_limb(k):
            if k < 4:
                return limb8("mullo", k)
            return limb8("mulhi", k - 4)

        gate_mul4 = mul(is_m, add(add(f3(0), f3(1)), add(f3(2), f3(3))))
        gate_div = mul(is_m, add(f3(5), f3(7)))
        gate_chain = add(gate_mul4, gate_div)
        # mula operand binding: rs1 for multiplies, the quotient for divides
        for lo_flag in (True, False):
            cs.append(mul(gate_mul4, sub_(lump_of2("mula", lo_flag),
                                          lump("rs1v", lo_flag))))
            cs.append(mul(gate_div, sub_(lump_of2("mula", lo_flag),
                                         lump_of2("mdiv_q", lo_flag))))
        for k in range(7):
            expr = prod_limbs(k)
            if k > 0:
                expr = add(expr, carry_lump(k - 1))
            expr = sub_(expr, add(out_limb(k),
                                  mul(ops.const(256), carry_lump(k))))
            cs.append(mul(gate_chain, expr))
        cs.append(mul(gate_chain, sub_(carry_lump(6), out_limb(7))))

        def lump_of(name, lo):
            r = range(0, 16) if lo else range(16, 32)
            return lin([(1 << (j % 16), m(name, j)) for j in r])

        # result binding per variant
        g = mul(is_m, f3(0))       # MUL: rd = lo
        cs.append(mul(g, sub_(lump("res", True), lump_of("mullo", True))))
        cs.append(mul(g, sub_(lump("res", False), lump_of("mullo", False))))
        g = mul(is_m, f3(3))       # MULHU: rd = hi (unsigned)
        cs.append(mul(g, sub_(lump("res", True), lump_of("mulhi", True))))
        cs.append(mul(g, sub_(lump("res", False), lump_of("mulhi", False))))
        # MULH / MULHSU: rd + adj = hi_u (mod 2^32), adj = a31*b [+ b31*a]
        a31 = m("rs1v", 31)
        b31 = m("rs2v", 31)
        k1 = lin([(1, m("madj_k", 0)), (2, m("madj_k", 1))])
        k2 = lin([(1, m("madj_k", 2)), (2, m("madj_k", 3))])
        two16c = ops.const(1 << 16)
        for f3k, use_b31 in ((1, True), (2, False)):
            gk = mul(is_m, f3(f3k))
            adj_lo = mul(a31, lump("rs2v", True))
            adj_hi = mul(a31, lump("rs2v", False))
            if use_b31:
                adj_lo = add(adj_lo, mul(b31, lump("rs1v", True)))
                adj_hi = add(adj_hi, mul(b31, lump("rs1v", False)))
            cs.append(mul(gk, sub_(add(lump("res", True), adj_lo),
                                   add(lump_of("mulhi", True),
                                       mul(two16c, k1)))))
            cs.append(mul(gk, sub_(add(add(lump("res", False), adj_hi), k1),
                                   add(lump_of("mulhi", False),
                                       mul(two16c, k2)))))

        # --- DIVU / REMU ---------------------------------------------------
        # b == 0 detection per limb (eq + inverse trick, gated by the unit)
        blo = lump("rs2v", True)
        bhi = lump("rs2v", False)
        cs.append(mul(gate_div, mul(m("bz_lo_eq"), blo)))
        cs.append(mul(gate_div, sub_(sub_(one, m("bz_lo_eq")),
                                     mul(blo, m("bz_lo_inv")))))
        cs.append(mul(gate_div, mul(m("bz_hi_eq"), bhi)))
        cs.append(mul(gate_div, sub_(sub_(one, m("bz_hi_eq")),
                                     mul(bhi, m("bz_hi_inv")))))
        b_zero = mul(m("bz_lo_eq"), m("bz_hi_eq"))
        # committed gates: div_en = div & b!=0, div0 = div & b==0
        cs.append(sub_(m("div_en"), mul(gate_div, sub_(one, b_zero))))
        cs.append(sub_(m("div0"), mul(gate_div, b_zero)))
        den = m("div_en")
        # q*b must not overflow 32 bits
        cs.append(mul(den, lump_of("mulhi", True)))
        cs.append(mul(den, lump_of("mulhi", False)))
        # q*b + r = a (exactly; the top carry must be zero)
        cs.append(mul(den, sub_(add(lump_of("mullo", True),
                                    lump_of2("mdiv_r", True)),
                                add(lump("rs1v", True),
                                    mul(two16c, m("mdiv_c1"))))))
        cs.append(mul(den, sub_(add(add(lump_of("mullo", False),
                                        lump_of2("mdiv_r", False)),
                                    m("mdiv_c1")),
                                lump("rs1v", False))))
        # r < b  via  r + 1 + t = b (t >= 0 committed in bits, no overflow)
        cs.append(mul(den, sub_(add(add(lump_of2("mdiv_r", True), one),
                                    lump_of2("mdiv_t", True)),
                                add(lump("rs2v", True),
                                    mul(two16c, m("mdiv_e1"))))))
        cs.append(mul(den, sub_(add(add(lump_of2("mdiv_r", False),
                                        lump_of2("mdiv_t", False)),
                                    m("mdiv_e1")),
                                lump("rs2v", False))))
        # result binding: DIVU -> q, REMU -> r; b==0: q=0xFFFFFFFF, r=a
        cs.append(mul(mul(den, f3(5)), sub_(lump("res", True),
                                            lump_of2("mdiv_q", True))))
        cs.append(mul(mul(den, f3(5)), sub_(lump("res", False),
                                            lump_of2("mdiv_q", False))))
        cs.append(mul(mul(den, f3(7)), sub_(lump("res", True),
                                            lump_of2("mdiv_r", True))))
        cs.append(mul(mul(den, f3(7)), sub_(lump("res", False),
                                            lump_of2("mdiv_r", False))))
        dz = m("div0")
        cs.append(mul(mul(dz, f3(5)), sub_(lump("res", True),
                                           ops.const(0xFFFF))))
        cs.append(mul(mul(dz, f3(5)), sub_(lump("res", False),
                                           ops.const(0xFFFF))))
        cs.append(mul(mul(dz, f3(7)), sub_(lump("res", True),
                                           lump("rs1v", True))))
        cs.append(mul(mul(dz, f3(7)), sub_(lump("res", False),
                                           lump("rs1v", False))))
        subf = m("sub")
        cs.append(sub_(subf, mul(mul(op_alu, f3(0)), m("insn", 30))))

        def xor_lump(name, flag, lo):
            r = range(0, 16) if lo else range(16, 32)
            return lin([(1 << (j % 16),
                         add(m(name, j), mul(flag, sub_(one, mul(ops.const(2), m(name, j))))))
                        for j in r])
        adder(mul(op_alu, f3(0)),
              lump("rs1v", True), lump("rs1v", False),
              xor_lump("rs2v", subf, True), xor_lump("rs2v", subf, False),
              subf)
        # AUIPC: res = pc + imm_u
        adder(sel("AUIPC"), lump("pc", True), lump("pc", False),
              imm_lump("u", True), imm_lump("u", False), ops.const(0))
        # JAL/JALR: res = pc + 4
        adder(add(sel("JAL"), sel("JALR")), lump("pc", True), lump("pc", False),
              ops.const(4), ops.const(0), ops.const(0))
        # LUI: res = imm_u
        cs.append(mul(sel("LUI"), sub_(lump("res", True), imm_lump("u", True))))
        cs.append(mul(sel("LUI"), sub_(lump("res", False), imm_lump("u", False))))

        # logic ops (bitwise): AND f3=7, OR f3=6, XOR f3=4
        for f3k, opname in ((7, "and"), (6, "or"), (4, "xor")):
            for cls, b_of in (("OPIMM", lambda j: _imm_bit_expr(m, j)),
                              ("OP", lambda j: m("rs2v", j))):
                gate = mul(op_alu if cls == "OP" else sel(cls), f3(f3k))
                for j in range(32):
                    a = m("rs1v", j)
                    b = b_of(j)
                    ab = mul(a, b)
                    if opname == "and":
                        val = ab
                    elif opname == "or":
                        val = sub_(add(a, b), ab)
                    else:
                        val = sub_(add(a, b), mul(ops.const(2), ab))
                    cs.append(mul(gate, sub_(m("res", j), val)))

        # shifts: one-hot shamt unit
        sh_sum = lin([(1, m("sh_sel", k)) for k in range(32)])
        cs.append(sub_(sh_sum, one))
        sh_idx = lin([(k, m("sh_sel", k)) for k in range(1, 32)])
        shamt_imm = lin([(1 << (i - 20), m("insn", i)) for i in range(20, 25)])
        shamt_reg = lin([(1 << j, m("rs2v", j)) for j in range(5)])
        shamt_v = add(mul(mul(sel("OPIMM"), add(f3(1), f3(5))), shamt_imm),
                      mul(mul(op_alu, add(f3(1), f3(5))), shamt_reg))
        cs.append(sub_(sh_idx, shamt_v))
        sra = m("insn", 30)
        for cls in ("OPIMM", "OP"):
            cls_sel = op_alu if cls == "OP" else sel(cls)
            gate_l = mul(cls_sel, f3(1))
            gate_r = mul(cls_sel, f3(5))
            for j in range(32):
                left = lin([(1, mul(m("sh_sel", k), m("rs1v", j - k)))
                            for k in range(0, j + 1)])
                cs.append(mul(gate_l, sub_(m("res", j), left)))
                rterms = [(1, mul(m("sh_sel", k), m("rs1v", j + k)))
                          for k in range(0, 32 - j)]
                rfill = [(1, mul(m("sh_sel", k), mul(sra, m("rs1v", 31))))
                         for k in range(32 - j, 32)]
                cs.append(mul(gate_r, sub_(m("res", j), lin(rterms + rfill))))

        # SLT/SLTU: res = lt (bit 0), rest zero
        for cls in ("OPIMM", "OP"):
            gate = mul(op_alu if cls == "OP" else sel(cls), add(f3(2), f3(3)))
            cs.append(mul(gate, sub_(m("res", 0), lt)))
            cs.append(mul(gate, lin([(1 << (j % 16), m("res", j))
                                     for j in range(1, 16)])))
            cs.append(mul(gate, lump("res", False)))

        # --- branch taken -------------------------------------------------
        cond = add(add(mul(f3(0), eq), mul(f3(1), sub_(one, eq))),
                   add(add(mul(f3(4), lt), mul(f3(5), sub_(one, lt))),
                       add(mul(f3(6), lt), mul(f3(7), sub_(one, lt)))))
        cs.append(mul(sel("BRANCH"), sub_(m("taken"), cond)))
        cs.append(mul(sub_(one, sel("BRANCH")), m("taken")))

        # --- next-pc adder ------------------------------------------------
        # A = pc (or rs1 for JALR); B per class; holds on every row but last
        jalr = sel("JALR")
        a_npc_lo = add(mul(jalr, lump("rs1v", True)),
                       mul(sub_(one, jalr), lump("pc", True)))
        a_npc_hi = add(mul(jalr, lump("rs1v", False)),
                       mul(sub_(one, jalr), lump("pc", False)))
        seq = lin([(1, sel(nm)) for nm in
                   ("LUI", "AUIPC", "LOAD", "STORE", "OPIMM", "OP",
                    "SYSTEM", "FENCE")])
        tk = m("taken")
        b_npc_lo = add(add(mul(seq, ops.const(4)),
                           mul(sel("JAL"), imm_lump("j", True))),
                       add(mul(jalr, sub_(imm_lump("i", True), m("jalr_lsb"))),
                           mul(sel("BRANCH"),
                               add(mul(tk, sub_(imm_lump("b", True),
                                                ops.const(4))),
                                   ops.const(4)))))
        b_npc_hi = add(add(mul(sel("JAL"), imm_lump("j", False)),
                           mul(jalr, imm_lump("i", False))),
                       mul(sel("BRANCH"), mul(tk, imm_lump("b", False))))
        cs.append(mul(not_last,
                      sub_(add(a_npc_lo, b_npc_lo),
                           add(lump("pc", True, 1), mul(two16, m("npc_c1"))))))
        cs.append(mul(not_last,
                      sub_(add(add(a_npc_hi, b_npc_hi), m("npc_c1")),
                           add(lump("pc", False, 1),
                               mul(two16, m("npc_c2"))))))

        # --- publics: entry / exit pc -------------------------------------
        isf, isl = ctl(C_IS_FIRST), ctl(C_IS_LAST)
        cs.append(mul(isf, sub_(lump("pc", True), publics[0])))
        cs.append(mul(isf, sub_(lump("pc", False), publics[1])))
        cs.append(mul(isl, sub_(lump("pc", True), publics[2])))
        cs.append(mul(isl, sub_(lump("pc", False), publics[3])))

        # --- LogUp program binding ----------------------------------------
        g1_2 = mul(g1v, g1v)
        g1_3 = mul(g1_2, g1v)
        key_f = add(add(lump("pc", True), mul(g1v, lump("pc", False))),
                    add(mul(g1_2, lump("insn", True)),
                        mul(g1_3, lump("insn", False))))
        key_r = add(add(ctl(C_ROM_ALO), mul(g1v, ctl(C_ROM_AHI))),
                    add(mul(g1_2, ctl(C_ROM_WLO)),
                        mul(g1_3, ctl(C_ROM_WHI))))
        t = v("aux", A_T)
        u = v("aux", A_U)
        acc = v("aux", A_ACC)
        active = sub_(sub_(one, sel("PAD")), sel("INIT"))
        cs.append(sub_(mul(sub_(g0, key_f), t), active))
        cs.append(sub_(mul(sub_(g0, key_r), u), m("rom_m")))
        cs.append(mul(isf, sub_(acc, sub_(t, u))))
        cs.append(mul(not_last,
                      sub_(v("aux", A_ACC, 1),
                           add(acc, sub_(v("aux", A_T, 1), v("aux", A_U, 1))))))
        cs.append(mul(isl, acc))

        # --- register-file memory argument (challenges g2, g3) ------------
        g2 = challenges[2]
        g3 = challenges[3]
        g3_2 = mul(g3, g3)
        g3_3 = mul(g3_2, g3)
        g3_4 = mul(g3_3, g3)
        cyc = ctl(C_CYCLE)
        three_cyc = mul(ops.const(3), cyc)

        def fp(reg, ts, vlo, vhi, wr):
            out = add(reg, mul(g3, ts))
            out = add(out, mul(g3_2, vlo))
            out = add(out, mul(g3_3, vhi))
            return add(out, mul(g3_4, wr))

        rs1_f = lin([(1 << (i - 15), m("insn", i)) for i in range(15, 20)])
        rs2_f = lin([(1 << (i - 20), m("insn", i)) for i in range(20, 25)])
        rd_f = lin([(1 << (i - 7), m("insn", i)) for i in range(7, 12)])
        # rd_nz = (rd_f != 0) via the inverse trick
        rd_nz = m("rd_nz")
        cs.append(sub_(rd_nz, mul(rd_f, m("rd_inv"))))
        cs.append(mul(sub_(one, rd_nz), rd_f))

        wb = lin([(1, sel(nm)) for nm in WB_CLASSES])
        w_act = add(mul(wb, rd_nz), sel("SYSTEM"))
        w_reg = add(add(mul(mul(wb, rd_nz), rd_f),
                        mul(sel("SYSTEM"), ops.const(10))),
                    mul(sel("INIT"), cyc))
        w_act_all = add(w_act, sel("INIT"))

        fp_r1 = fp(rs1_f, three_cyc, lump("rs1v", True), lump("rs1v", False),
                   ops.const(0))
        fp_r2 = fp(rs2_f, add(three_cyc, one), lump("rs2v", True),
                   lump("rs2v", False), ops.const(0))
        fp_w = fp(w_reg, add(three_cyc, ops.const(2)), lump("res", True),
                  lump("res", False), one)
        t_r1, t_r2, t_w = v("aux", A_RU), v("aux", A_RU + 1), v("aux", A_RU + 2)
        cs.append(sub_(mul(sub_(g2, fp_r1), t_r1), active))
        cs.append(sub_(mul(sub_(g2, fp_r2), t_r2), active))
        cs.append(sub_(mul(sub_(g2, fp_w), t_w), w_act_all))
        for u in range(3):
            fp_s = fp(m("m_reg", u), m("m_cyc", u), m("m_vlo", u),
                      m("m_vhi", u), m("m_wr", u))
            cs.append(sub_(mul(sub_(g2, fp_s), v("aux", A_RS + u)),
                           m("m_act", u)))
        # running sum over (unsorted - sorted)
        def rdelta(off=0):
            d = add(add(v("aux", A_RU, off), v("aux", A_RU + 1, off)),
                    v("aux", A_RU + 2, off))
            for u in range(3):
                d = sub_(d, v("aux", A_RS + u, off))
            return d
        racc = v("aux", A_RACC)
        cs.append(mul(isf, sub_(racc, rdelta())))
        cs.append(mul(not_last, sub_(v("aux", A_RACC, 1),
                                     add(racc, rdelta(1)))))
        cs.append(mul(isl, racc))

        # sorted-trace consistency: 3 boundaries per row
        # boundary (prev=(u-1 or prev row u2), next=u)
        def ord_lump(u, off=0):
            return lin([(1 << j, m("ord_bits", u * ORD_BITS + j, off))
                        for j in range(ORD_BITS)])

        def boundary(prev, nxt, gate_extra=None):
            """prev/nxt: dicts of field accessors."""
            actN = nxt["act"]
            if gate_extra is not None:
                actN = mul(gate_extra, actN)
            sameN = nxt["same"]
            cs.append(mul(actN, sub_(one, prev["act"])))        # prefix
            cs.append(mul(sameN, sub_(nxt["reg"], prev["reg"])))
            d = add(mul(sameN, sub_(sub_(nxt["ts"], prev["ts"]), one)),
                    mul(sub_(one, sameN),
                        sub_(sub_(nxt["reg"], prev["reg"]), one)))
            cs.append(mul(actN, sub_(d, nxt["ord"])))
            rd_gate = mul(actN, mul(sub_(one, nxt["wr"]), sameN))
            cs.append(mul(rd_gate, sub_(nxt["vlo"], prev["vlo"])))
            cs.append(mul(rd_gate, sub_(nxt["vhi"], prev["vhi"])))
            new_gate = mul(actN, mul(sub_(one, nxt["wr"]), sub_(one, sameN)))
            cs.append(mul(new_gate, nxt["vlo"]))
            cs.append(mul(new_gate, nxt["vhi"]))

        def unit(u, off=0):
            return {"reg": m("m_reg", u, off), "ts": m("m_cyc", u, off),
                    "vlo": m("m_vlo", u, off), "vhi": m("m_vhi", u, off),
                    "wr": m("m_wr", u, off), "act": m("m_act", u, off),
                    "same": m("m_same", u, off),
                    "ord": ord_lump(u, off)}

        boundary(unit(0), unit(1))
        boundary(unit(1), unit(2))
        # cross-row: (row r, u2) -> (row r+1, u0), gated not_last
        nxt0 = unit(0, 1)
        boundary(unit(2), nxt0, gate_extra=not_last)
        # the very first sorted entry has no predecessor
        cs.append(mul(isf, m("m_same", 0)))

        return cs


def _imm_bit_expr(m, j):
    """Bit j of the sign-extended I-immediate as an insn-bit expression."""
    bits = _imm_bits("i")
    e = bits[j]
    return m("insn", e[1])


def _vec_modinv(x: np.ndarray) -> np.ndarray:
    """Vectorized modular inverse via x^(p-2) (numpy uint64)."""
    x = x.astype(np.uint64) % np.uint64(P)
    result = np.ones_like(x)
    base = x.copy()
    e = P - 2
    while e:
        if e & 1:
            result = result * base % np.uint64(P)
        base = base * base % np.uint64(P)
        e >>= 1
    return result


# ---------------------------------------------------------------------------
# Segment prove / verify (zkvm.LocalProver entry points)
# ---------------------------------------------------------------------------


def _air_for_image(image_addrs, image_words) -> Rv32imAir:
    return Rv32imAir(image_addrs, image_words)


def choose_po2(rows: int, image_len: int) -> int:
    need = max(rows + N_INIT_ROWS + 1, image_len, 64)
    return max(int(np.ceil(np.log2(need))), 6)


def prove_segment(seg, image_addrs, image_words):
    """Prove one executor segment; returns the encoded seal (np.uint32)."""
    air = _air_for_image(image_addrs, image_words)
    po2 = choose_po2(seg.trace.shape[0], len(image_addrs))
    main, publics = air.witgen(seg.trace, po2, seg.exit_pc, seg.entry_regs)
    proof = prover_mod.prove(air, main, publics)
    return proof_mod.encode(proof)


def verify_segments(seals, claim, image_addrs, image_words, entry_pc: int):
    """Verify a chain of segment seals: each proof valid + pc continuity."""
    from ..zkvm import VerificationError
    air = _air_for_image(image_addrs, image_words)
    expect_pc = int(entry_pc)
    if not seals:
        raise VerificationError("no segment seals")
    for i, seal in enumerate(seals):
        proof = proof_mod.decode(seal)
        pubs = [int(p) for p in proof.publics]
        if pubs[0] != expect_pc & 0xFFFF or pubs[1] != expect_pc >> 16:
            raise VerificationError(f"segment {i}: entry pc mismatch")
        try:
            verifier_mod.verify(air, proof, pubs)
        except verifier_mod.VerificationError as e:
            raise VerificationError(f"segment {i}: {e}") from e
        expect_pc = pubs[2] | (pubs[3] << 16)
