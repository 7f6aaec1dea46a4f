"""Symbolic constraint capture + device tape evaluator.

Round-1's prover compiled the AIR constraint polynomials directly into
XLA graphs (chunked jits). XLA compile time is superlinear in graph size,
so the bit-decomposed rv32im circuit (~2.5k constraints, ~100k field ops)
took ~33 minutes to compile — the round-1 driver bench timed out on it
(VERDICT.md "What's weak" #1).

This module replaces that with the classic accelerator answer: the
constraint system is *data*, not code. ``air.constraints()`` runs ONCE on
host with symbolic ops, producing a hash-consed DAG; the DAG is lowered
to a linear tape of two fat vector ops (LINC: ``s_a*A + s_b*B``; MUL:
``A*B``); a single small jitted ``lax.scan`` interprets the tape over the
LDE domain in row-blocks. Compile time is O(1) in circuit size (the scan
body is ~30 HLO ops), identical for every AIR, and the alpha-mix of all
constraint values happens in a fused fori reduction over the staged rows.

Mirrors the role of the reference's generated constraint-eval steps
(risc0-circuit-rv32im "poly_ext"/eval tapes, SURVEY.md §2.2) re-designed
for XLA's compile model.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .. import field as F
from ..field import P

_U32 = jnp.uint32

# node kinds
K_CONST, K_SCALAR, K_LEAF, K_ADD, K_SUB, K_MUL = range(6)
# tape opcodes
OP_LINC, OP_MUL = 0, 1

BLOCK_ROWS = 1 << 17          # LDE rows per interpreter block
REDUCE_CHUNK = 8              # stage rows folded per reduction step


class _Node:
    __slots__ = ("i", "kind", "a", "b", "payload", "deg", "is_scalar")

    def __init__(self, i, kind, a, b, payload, deg, is_scalar):
        self.i = i
        self.kind = kind
        self.a = a
        self.b = b
        self.payload = payload
        self.deg = deg
        self.is_scalar = is_scalar


class Capture:
    """Builds the hash-consed DAG while air.constraints() runs."""

    def __init__(self):
        self.nodes: list[_Node] = []
        self._memo: dict = {}

    def _intern(self, kind, a, b, payload, deg, is_scalar):
        if kind in (K_ADD, K_MUL):          # commutative canonical order
            ka, kb = (a.i, b.i) if a.i <= b.i else (b.i, a.i)
            if ka != a.i:
                a, b = b, a
        key = (kind, a.i if a else -1, b.i if b else -1, payload)
        n = self._memo.get(key)
        if n is None:
            n = _Node(len(self.nodes), kind, a, b, payload, deg, is_scalar)
            self.nodes.append(n)
            self._memo[key] = n
        return n

    def const(self, c: int):
        return self._intern(K_CONST, None, None, int(c) % P, 0, True)

    def scalar(self, tag):
        """Runtime scalar input: ('pub', i) or ('chal', i, comp)."""
        return self._intern(K_SCALAR, None, None, tag, 0, True)

    def leaf(self, group: str, col: int, offset: int):
        return self._intern(K_LEAF, None, None, (group, col, offset), 1, False)

    def add(self, a, b):
        if a.kind == K_CONST and b.kind == K_CONST:
            return self.const(a.payload + b.payload)
        if a.kind == K_CONST and a.payload == 0:
            return b
        if b.kind == K_CONST and b.payload == 0:
            return a
        return self._intern(K_ADD, a, b, None, max(a.deg, b.deg),
                            a.is_scalar and b.is_scalar)

    def sub(self, a, b):
        if a.kind == K_CONST and b.kind == K_CONST:
            return self.const(a.payload - b.payload)
        if b.kind == K_CONST and b.payload == 0:
            return a
        if a is b:
            return self.const(0)
        return self._intern(K_SUB, a, b, None, max(a.deg, b.deg),
                            a.is_scalar and b.is_scalar)

    def mul(self, a, b):
        if a.kind == K_CONST and b.kind == K_CONST:
            return self.const(a.payload * b.payload)
        for x, y in ((a, b), (b, a)):
            if x.kind == K_CONST:
                if x.payload == 0:
                    return self.const(0)
                if x.payload == 1:
                    return y
        return self._intern(K_MUL, a, b, None, a.deg + b.deg,
                            a.is_scalar and b.is_scalar)

    def neg(self, a):
        return self.sub(self.const(0), a)


class SymOps:
    """ops-object passed to air.constraints() during capture."""

    is_device = False

    def __init__(self, cap: Capture):
        self._cap = cap
        self.add = cap.add
        self.sub = cap.sub
        self.mul = cap.mul
        self.neg = cap.neg
        self.const = cap.const


@dataclass
class TapeProgram:
    ops: np.ndarray            # (T, 6) int32 [opcode, a, b, sa, sb, dst]
    n_regs: int
    n_stage: int               # number of constraints (stage rows)
    leaves: list               # [(group, col, offset)] — leaf i at B[n_regs+n_stage+i]
    scalar_prog: list          # per-S-slot recipe (see _eval_scalars)
    max_degree: int


def _to_monty_np(a) -> np.ndarray:
    return ((np.asarray(a, np.uint64) << np.uint64(32))
            % np.uint64(P)).astype(np.uint32)


def capture(air, n_publics: int, challenges_sym) -> TapeProgram:
    """Run air.constraints symbolically and lower the DAG to a tape.

    challenges_sym: list passed as the ``challenges`` argument (built by
    the caller from cap.scalar tags — single scalars or 4-tuples).
    """
    cap = Capture()
    ops_obj = SymOps(cap)
    publics = [cap.scalar(("pub", i)) for i in range(n_publics)]
    chals = challenges_sym(cap)

    def v(group, col, offset=0):
        return cap.leaf(group, int(col), int(offset))

    roots = air.constraints(v, ops_obj, publics, chals)
    return lower(cap, roots)


def lower(cap: Capture, roots: list) -> TapeProgram:
    """DAG -> (scalar program, leaf list, register-allocated tape)."""
    nodes = cap.nodes
    n_nodes = len(nodes)

    # liveness: which nodes are actually needed
    needed = np.zeros(n_nodes, dtype=bool)
    stack = [r.i for r in roots]
    while stack:
        i = stack.pop()
        if needed[i]:
            continue
        needed[i] = True
        nd = nodes[i]
        if nd.a is not None:
            stack.append(nd.a.i)
        if nd.b is not None:
            stack.append(nd.b.i)

    # scalar slots: S[0]=1, S[1]=0, then one slot per needed scalar node
    scalar_prog = [("const", 1), ("const", 0)]
    scalar_slot = {}

    def slot_of(nd) -> int:
        s = scalar_slot.get(nd.i)
        if s is not None:
            return s
        if nd.kind == K_CONST:
            if nd.payload == 1:
                s = 0
            elif nd.payload == 0:
                s = 1
            else:
                s = len(scalar_prog)
                scalar_prog.append(("const", nd.payload))
        elif nd.kind == K_SCALAR:
            s = len(scalar_prog)
            scalar_prog.append(nd.payload)
        else:   # derived scalar node
            opn = {K_ADD: "add", K_SUB: "sub", K_MUL: "mul"}[nd.kind]
            sa, sb = slot_of(nd.a), slot_of(nd.b)
            s = len(scalar_prog)
            scalar_prog.append((opn, sa, sb))
        scalar_slot[nd.i] = s
        return s

    # leaf slots
    leaves = [("__one__", 0, 0)]
    leaf_idx = {}

    # last use index (over row-valued nodes, in node order = topo order)
    last_use = np.full(n_nodes, -1, dtype=np.int64)
    for nd in nodes:
        if not needed[nd.i] or nd.is_scalar:
            continue
        for op in (nd.a, nd.b):
            if op is not None and not op.is_scalar:
                last_use[op.i] = nd.i
    n_stage = len(roots)
    for r in roots:
        last_use[r.i] = n_nodes + 1     # roots live to the end

    # register allocation + tape emission
    loc: dict[int, tuple] = {}          # node -> ("reg"|"stage"|"leaf", idx)
    free_regs: list[int] = []
    n_regs = 0
    tape = []                            # rows appended as python lists
    root_stage = {}
    for e, r in enumerate(roots):
        root_stage.setdefault(r.i, []).append(e)

    # map locations to B-row indices later (need final n_regs first)
    def alloc_reg():
        nonlocal n_regs
        if free_regs:
            return free_regs.pop()
        n_regs += 1
        return n_regs - 1

    pending_release: dict[int, list[int]] = {}

    def operand(nd):
        """Return ('row', loc) or ('scalar', slot)."""
        if nd.is_scalar:
            return ("scalar", slot_of(nd))
        return ("row", loc[nd.i])

    max_deg = 0
    for nd in nodes:
        if not needed[nd.i] or nd.is_scalar:
            continue
        max_deg = max(max_deg, nd.deg)
        if nd.kind == K_LEAF:
            li = leaf_idx.get(nd.payload)
            if li is None:
                li = len(leaves)
                leaves.append(nd.payload)
                leaf_idx[nd.payload] = li
            loc[nd.i] = ("leaf", li)
        else:
            a, b = nd.a, nd.b
            oa, ob = operand(a), operand(b)
            # destination: a stage row if this node is a constraint root,
            # else a temp register
            stages = root_stage.get(nd.i, [])
            if stages:
                dst = ("stage", stages[0])
            else:
                dst = ("reg", alloc_reg())
            if nd.kind == K_MUL and oa[0] == "row" and ob[0] == "row":
                tape.append([OP_MUL, oa[1], ob[1], 0, 0, dst])
            else:
                # express as LINC: s_a*A + s_b*B
                if nd.kind == K_MUL:
                    # one operand is scalar
                    (srow, sslot) = (oa, ob) if oa[0] == "row" else (ob, oa)
                    tape.append([OP_LINC, srow[1], srow[1],
                                 sslot[1], 1, dst])     # s*A + 0*A
                elif nd.kind in (K_ADD, K_SUB):
                    neg1 = _scalar_const(scalar_prog, scalar_slot, P - 1)
                    if oa[0] == "row" and ob[0] == "row":
                        sb = 0 if nd.kind == K_ADD else neg1
                        tape.append([OP_LINC, oa[1], ob[1], 0, sb, dst])
                    elif oa[0] == "row":            # row op scalar
                        sb = ob[1] if nd.kind == K_ADD else _scalar_negate(
                            scalar_prog, scalar_slot, ob[1])
                        tape.append([OP_LINC, oa[1], ("leaf", 0), 0, sb, dst])
                    else:                            # scalar op row
                        sa = oa[1]
                        sb = 0 if nd.kind == K_ADD else neg1
                        tape.append([OP_LINC, ("leaf", 0), ob[1], sa, sb, dst])
                else:
                    raise AssertionError(nd.kind)
            loc[nd.i] = dst
            # extra stage copies for duplicate roots
            for e in stages[1:]:
                tape.append([OP_LINC, dst, dst, 0, 1, ("stage", e)])
            # release dead operands
            for opn in (a, b):
                if (opn is not None and not opn.is_scalar
                        and last_use[opn.i] == nd.i):
                    l = loc.get(opn.i)
                    if l and l[0] == "reg":
                        free_regs.append(l[1])
                        loc.pop(opn.i)

    # roots that are leaves or scalars need explicit stage materialization
    for e, r in enumerate(roots):
        if r.is_scalar:
            tape.append([OP_LINC, ("leaf", 0), ("leaf", 0),
                         slot_of(r), 1, ("stage", e)])
        elif r.kind == K_LEAF:
            tape.append([OP_LINC, loc[r.i], loc[r.i], 0, 1, ("stage", e)])

    # resolve locations to flat B indices: [regs | stage | leaves]
    def b_index(l):
        kind, idx = l
        if kind == "reg":
            return idx
        if kind == "stage":
            return n_regs + idx
        return n_regs + n_stage + idx

    ops_arr = np.zeros((len(tape), 6), dtype=np.int32)
    for t, (opc, a, b, sa, sb, dst) in enumerate(tape):
        ops_arr[t] = [opc, b_index(a) if isinstance(a, tuple) else a,
                      b_index(b) if isinstance(b, tuple) else b,
                      sa, sb, b_index(dst)]
    # fix: 'reg' operands recorded as raw ints inside tuples only; normalize
    return TapeProgram(ops=ops_arr, n_regs=n_regs, n_stage=n_stage,
                       leaves=leaves, scalar_prog=scalar_prog,
                       max_degree=max_deg)


def _scalar_const(scalar_prog, scalar_slot, v):
    key = ("rawconst", v)
    s = scalar_slot.get(key)
    if s is None:
        s = len(scalar_prog)
        scalar_prog.append(("const", v))
        scalar_slot[key] = s
    return s


def _scalar_negate(scalar_prog, scalar_slot, slot):
    key = ("neg", slot)
    s = scalar_slot.get(key)
    if s is None:
        s = len(scalar_prog)
        scalar_prog.append(("sub", 1, slot))    # 0 - x  (S[1] = 0)
        scalar_slot[key] = s
    return s


def eval_scalars(tp: TapeProgram, publics, challenges) -> np.ndarray:
    """Compute the runtime scalar array S (Montgomery uint32).

    challenges: (n_challenges, 4) standard-form numpy.
    """
    vals = np.zeros(len(tp.scalar_prog), dtype=np.uint64)
    for i, rec in enumerate(tp.scalar_prog):
        tag = rec[0]
        if tag == "const":
            vals[i] = rec[1] % P
        elif tag == "pub":
            vals[i] = int(publics[rec[1]]) % P
        elif tag == "chal":
            vals[i] = int(challenges[rec[1]][rec[2]]) % P
        elif tag == "add":
            vals[i] = (vals[rec[1]] + vals[rec[2]]) % P
        elif tag == "sub":
            vals[i] = (vals[rec[1]] + P - vals[rec[2]]) % P
        elif tag == "mul":
            vals[i] = vals[rec[1]] * vals[rec[2]] % P
        else:
            raise AssertionError(rec)
    return _to_monty_np(vals)


# ---------------------------------------------------------------------------
# Level-parallel device evaluation (single-chip fast path)
# ---------------------------------------------------------------------------
#
# The scan interpreter below (_run_block) executes one tape op per scan
# step: 10k sequential (1, nb)-wide steps for the rv32im circuit, each
# HBM-latency-bound. But the constraint DAG is only ~35 levels deep with
# wide levels (3.5k ops in level 1), so the tape reorders into a
# *level schedule*: every level is two batched gathers + one fused
# elementwise op + one contiguous row-block write. 35 wide dispatches
# replace 10283 narrow ones (measured 5.9s -> sub-second at po2=18).


@dataclass
class LevelProgram:
    n_rows: int          # leaf rows + one row per op (SSA, level-major)
    n_leaves: int
    levels: tuple        # (row_off, m_ia, m_ib, l_ia, l_ib, l_sa, l_sb)
    stage_rows: np.ndarray          # (n_stage,) final row id per constraint
    leaf_groups: tuple   # ((group, off, col_idx_tuple), ...) in leaf order
    has_one: bool        # leaf row 0 is the constant-one row


def build_levels(tp: TapeProgram) -> LevelProgram:
    """Re-schedule a TapeProgram into the level-parallel SSA layout.

    Leaves are permuted so each (group, offset) stream is contiguous
    (leaf assembly becomes per-group slice+take, not per-leaf stacking);
    op rows are assigned level-major so each level writes one contiguous
    row block.
    """
    n_regs, n_stage = tp.n_regs, tp.n_stage
    n_leaves = len(tp.leaves)
    base = n_regs + n_stage

    # group leaves by (group, offset); leaf 0 is ('__one__', 0, 0)
    from collections import defaultdict
    grouped = defaultdict(list)
    has_one = tp.leaves[0][0] == "__one__"
    for i, (g, c, off) in enumerate(tp.leaves):
        if g == "__one__":
            continue
        grouped[(g, off)].append((i, c))
    leaf_perm = np.zeros(n_leaves, dtype=np.int64)   # old leaf idx -> new row
    leaf_groups = []
    pos = 1 if has_one else 0
    if has_one:
        leaf_perm[0] = 0
    for (g, off), items in sorted(grouped.items()):
        cols = []
        for i, c in items:
            leaf_perm[i] = pos
            pos += 1
            cols.append(c)
        leaf_groups.append((g, off, tuple(cols)))
    assert pos == n_leaves

    # SSA rename over the tape (B-slot space: [regs | stage | leaves])
    cur = {base + i: int(leaf_perm[i]) for i in range(n_leaves)}
    depth = [0] * n_leaves
    recs = []                        # [lev, opc, ia, ib, sa, sb, ssa_id]
    stage_src = [None] * n_stage
    for opc, a, b, sa, sb, dst in tp.ops.tolist():
        ia, ib = cur[a], cur[b]
        lev = max(depth[ia], depth[ib]) + 1
        rid = n_leaves + len(recs)
        depth.append(lev)
        recs.append([lev, opc, ia, ib, sa, sb, rid])
        cur[dst] = rid
        if n_regs <= dst < base:
            stage_src[dst - n_regs] = rid
    assert all(s is not None for s in stage_src), "unwritten stage row"

    # level-major final row ids (muls first within a level)
    by_level = defaultdict(list)
    for r in recs:
        by_level[r[0]].append(r)
    remap = {i: i for i in range(n_leaves)}
    levels = []
    row_off = n_leaves
    for lev in sorted(by_level):
        rs = by_level[lev]
        muls = [r for r in rs if r[1] == OP_MUL]
        lincs = [r for r in rs if r[1] == OP_LINC]
        start = row_off
        for r in muls + lincs:
            remap[r[6]] = row_off
            row_off += 1
        arr = lambda rows, j: np.array([remap[r[j]] for r in rows], np.int32)
        levels.append((
            start,
            arr(muls, 2), arr(muls, 3),
            arr(lincs, 2), arr(lincs, 3),
            np.array([r[4] for r in lincs], np.int32),
            np.array([r[5] for r in lincs], np.int32),
        ))
    stage_rows = np.array([remap[s] for s in stage_src], np.int32)
    return LevelProgram(n_rows=row_off, n_leaves=n_leaves,
                        levels=tuple(levels), stage_rows=stage_rows,
                        leaf_groups=tuple(leaf_groups), has_one=has_one)


_LEVEL_FNS: dict = {}


def _leveled_fn(key, lp: LevelProgram, nb: int, n_stage: int,
                stride: int = 4):
    """Jitted one-block evaluator with the level program as constants.

    Signature: fn(exts_tuple, start, S, W) -> (nb, 4) Montgomery.
    exts_tuple: per leaf-group-source (n+stride) LDE-row arrays extended
    by their first `stride` wrapped rows, in the order of distinct group
    names. stride: rows per +1 trace-row leaf offset (4 on the blowup-4
    LDE; 1 when evaluating a single coset — the streamed-main path).
    """
    fn = _LEVEL_FNS.get((key, nb, stride))
    if fn is not None:
        return fn

    gnames = []
    for g, off, cols in lp.leaf_groups:
        if g not in gnames:
            gnames.append(g)

    def impl(exts, start, S, W):
        blk = {}
        for gi, g in enumerate(gnames):
            c = exts[gi].shape[1]
            blk[g] = jax.lax.dynamic_slice(exts[gi], (start, 0),
                                           (nb + stride, c))
        mats = []
        if lp.has_one:
            mats.append(jnp.full((nb, 1), F.mont_one(), _U32))
        for g, off, cols in lp.leaf_groups:
            sub = jax.lax.slice_in_dim(blk[g], stride * off,
                                       stride * off + nb, axis=0)
            mats.append(jnp.take(sub, jnp.asarray(np.array(cols, np.int32)),
                                 axis=1))
        leaf_block = jnp.concatenate(mats, axis=1)       # (nb, n_leaves)

        B = jnp.zeros((lp.n_rows, nb), _U32)
        B = jax.lax.dynamic_update_slice(B, leaf_block.T, (0, 0))
        for (off, m_ia, m_ib, l_ia, l_ib, l_sa, l_sb) in lp.levels:
            outs = []
            if m_ia.shape[0]:
                va = jnp.take(B, jnp.asarray(m_ia), axis=0)
                vb = jnp.take(B, jnp.asarray(m_ib), axis=0)
                outs.append(F.mul(va, vb))
            if l_ia.shape[0]:
                va = jnp.take(B, jnp.asarray(l_ia), axis=0)
                vb = jnp.take(B, jnp.asarray(l_ib), axis=0)
                fa = S[jnp.asarray(l_sa)][:, None]
                fb = S[jnp.asarray(l_sb)][:, None]
                outs.append(F.add(F.mul(fa, va), F.mul(fb, vb)))
            out = outs[0] if len(outs) == 1 else \
                jnp.concatenate(outs, axis=0)
            B = jax.lax.dynamic_update_slice(B, out, (off, 0))

        stage = jnp.take(B, jnp.asarray(lp.stage_rows), axis=0)
        from .. import ntt as _ntt
        acc = [_ntt.modsum(F.mul(stage, W[:, c][:, None]), axis=0)
               for c in range(4)]
        return jnp.stack(acc, axis=1)                    # (nb, 4)

    fn = jax.jit(impl)
    _LEVEL_FNS[(key, nb, stride)] = fn
    return fn


# ---------------------------------------------------------------------------
# Scan-interpreter device evaluation (mesh/GSPMD path)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("specs",))
def _build_leafmat(specs, ldes):
    """(N, n_leaves) Montgomery leaf matrix. specs: static tuple of
    (group, col, offset); '__one__' is the constant-one row."""
    n = next(iter(ldes.values())).shape[0]
    # group leaves by (group, offset) for single gathers
    from collections import defaultdict
    grouped = defaultdict(list)
    for i, (g, c, off) in enumerate(specs):
        grouped[(g, off)].append((i, c))
    out = [None] * len(specs)
    for (g, off), items in grouped.items():
        if g == "__one__":
            for i, _ in items:
                out[i] = jnp.full((n,), F.mont_one(), _U32)
            continue
        idxs = np.array([c for _, c in items], dtype=np.int32)
        mat = ldes[g][:, idxs]
        if off:
            # next trace row = +BLOWUP in natural LDE order
            mat = jnp.roll(mat, -4 * off, axis=0)
        for k, (i, _) in enumerate(items):
            out[i] = mat[:, k]
    return jnp.stack(out, axis=1)


@functools.partial(jax.jit, static_argnames=("specs", "nb"))
def _build_leafblock(specs, ldes, start, nb: int):
    """(nb, n_leaves) Montgomery leaf matrix for rows [start, start+nb)
    (wrapping) — the full (N, n_leaves) matrix is ~8 GB at po2=18."""
    n = next(iter(ldes.values())).shape[0]
    rows = (jnp.arange(nb, dtype=jnp.int32) + start) % n
    from collections import defaultdict
    grouped = defaultdict(list)
    for i, (g, c, off) in enumerate(specs):
        grouped[(g, off)].append((i, c))
    out = [None] * len(specs)
    for (g, off), items in grouped.items():
        if g == "__one__":
            for i, _ in items:
                out[i] = jnp.full((nb,), F.mont_one(), _U32)
            continue
        idxs = np.array([c for _, c in items], dtype=np.int32)
        r = (rows + 4 * off) % n if off else rows
        mat = jnp.take(ldes[g][:, idxs], r, axis=0)
        for k, (i, _) in enumerate(items):
            out[i] = mat[:, k]
    return jnp.stack(out, axis=1)


@functools.partial(jax.jit, static_argnames=("n_regs", "n_stage"))
def _run_block(leaf_block, ops, S, W, n_regs: int, n_stage: int):
    """Interpret the tape over one row-block.

    leaf_block: (Nb, n_leaves) Montgomery; ops: (T, 6) int32; S: (s,)
    Montgomery scalars; W: (n_stage_padded, 4) Montgomery mix weights.
    Returns (Nb, 4) accumulated alpha-mix of all constraint values.
    """
    nb = leaf_block.shape[0]
    B0 = jnp.concatenate(
        [jnp.zeros((n_regs + n_stage, nb), _U32), leaf_block.T], axis=0)

    def step(B, op):
        opc, ai, bi, sa, sb, dst = (op[0], op[1], op[2], op[3], op[4], op[5])
        va = jax.lax.dynamic_index_in_dim(B, ai, 0, keepdims=False)
        vb = jax.lax.dynamic_index_in_dim(B, bi, 0, keepdims=False)
        fa = S[sa]
        fb = S[sb]
        is_mul = opc == OP_MUL
        # p1 = MUL ? va*vb : fa*va ; p2 = MUL ? 0 : fb*vb
        x1 = jnp.where(is_mul, va, jnp.broadcast_to(fa, va.shape))
        y1 = jnp.where(is_mul, vb, va)
        p1 = F.mul(x1, y1)
        f2 = jnp.where(is_mul, jnp.uint32(0), fb)
        p2 = F.mul(jnp.broadcast_to(f2, vb.shape), vb)
        out = F.add(p1, p2)
        B = jax.lax.dynamic_update_index_in_dim(B, out, dst, 0)
        return B, None

    B, _ = jax.lax.scan(step, B0, ops)
    stage = B[n_regs:n_regs + n_stage]
    pad = (-n_stage) % REDUCE_CHUNK
    if pad:
        stage = jnp.concatenate([stage, jnp.zeros((pad, nb), _U32)], axis=0)

    def red(i, acc):
        rows = jax.lax.dynamic_slice(
            stage, (i * REDUCE_CHUNK, 0), (REDUCE_CHUNK, nb))
        w = jax.lax.dynamic_slice(W, (i * REDUCE_CHUNK, 0), (REDUCE_CHUNK, 4))
        for k in range(REDUCE_CHUNK):
            acc = F.add(acc, F.mul(rows[k][None, :], w[k][:, None]))
        return acc

    acc = jax.lax.fori_loop(0, stage.shape[0] // REDUCE_CHUNK, red,
                            jnp.zeros((4, nb), _U32))
    return acc.T            # (Nb, 4)


def eval_check(tp: TapeProgram, ldes: dict, publics, challenges,
               alpha_pows_std: np.ndarray, single_block: bool = False,
               stride: int = 4):
    """Evaluate acc(x) = sum_i alpha^i * C_i(x) over the whole LDE domain.

    Returns an (N, 4) Montgomery device array (N = LDE rows).
    single_block: evaluate the whole domain in one dispatch (used when the
    LDEs are mesh-sharded — the interpreter is row-elementwise, so GSPMD
    partitions it cleanly; host row-blocking would force resharding).
    stride: LDE rows per +1 trace-row leaf offset — 4 for blowup-4 LDE
    inputs, 1 when `ldes` carries a SINGLE coset's evaluations (the
    streamed-main po2>=20 path evaluates the check polynomial coset by
    coset).
    """
    S = jnp.asarray(eval_scalars(tp, publics, challenges))
    n = next(iter(ldes.values())).shape[0]
    if single_block:
        # mesh-sharded path: one GSPMD dispatch over the whole domain via
        # the scan interpreter (row-elementwise, partitions cleanly)
        pad = (-tp.n_stage) % REDUCE_CHUNK
        W = np.zeros((tp.n_stage + pad, 4), dtype=np.uint64)
        W[:tp.n_stage] = np.asarray(alpha_pows_std, np.uint64)[:tp.n_stage]
        W = jnp.asarray(_to_monty_np(W))
        leafmat = _build_leafmat(tuple(tp.leaves), ldes)
        return _run_block(leafmat, jnp.asarray(tp.ops), S, W,
                          tp.n_regs, tp.n_stage)
    # single-chip: level-parallel evaluator over row blocks, sized so the
    # SSA value buffer (n_rows x nb u32) stays under ~0.75 GB
    lp = _level_program(tp)
    W = jnp.asarray(_to_monty_np(
        np.asarray(alpha_pows_std, np.uint64)[:tp.n_stage]))
    target = max(4096, (1 << 28) // max(lp.n_rows, 1))
    nb = min(n, BLOCK_ROWS, 1 << (target.bit_length() - 1))
    gnames = []
    for g, off, cols in lp.leaf_groups:
        if g not in gnames:
            gnames.append(g)
    # Interior blocks slice (nb + 4) rows straight from the raw LDEs (the
    # +1-trace-row leaf offset never crosses the end); only the FINAL
    # block wraps, and gets a small (nb + 4, c) tail copy per group.
    # Copying the whole LDE +4 rows (the previous approach) doubled
    # resident HBM — the po2>=19 blocker.
    raw = tuple(ldes[g] for g in gnames)
    fn = _leveled_fn(id(tp), lp, nb, tp.n_stage, stride)
    outs = [fn(raw, jnp.int32(start), S, W)
            for start in range(0, n - nb, nb)]
    tails = tuple(_wrap_tail(ldes[g], nb, stride) for g in gnames)
    outs.append(fn(tails, jnp.int32(0), S, W))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("nb", "stride"))
def _wrap_tail(lde, nb: int, stride: int = 4):
    """Last (nb) LDE rows extended by the first `stride` (wrap block)."""
    return jnp.concatenate([lde[lde.shape[0] - nb:], lde[:stride]], axis=0)


_LEVEL_PROGS: dict = {}


def _level_program(tp: TapeProgram) -> LevelProgram:
    lp = _LEVEL_PROGS.get(id(tp))
    if lp is None:
        lp = build_levels(tp)
        _LEVEL_PROGS[id(tp)] = lp
    return lp
