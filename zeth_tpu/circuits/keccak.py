"""Keccak-f[1600] accelerator circuit: prove batches of permutations.

TPU-native replacement for risc0-circuit-keccak 4.0.2 (SURVEY.md §2.2):
the guest's keccak syscalls are recorded by the executor and proven here
as a standalone STARK, off the main rv32im trace — the reference's
accelerator-offload axis (§2.3).

Trace layout: each permutation occupies a 32-row block — rows 0..23 hold
the state at the start of each round, row 24 holds the output state,
rows 25..31 are zero padding. Columns (all bits):

  s[1600]   state A (lane-major: lane*64 + z)
  c[320]    theta column parities    (x*64 + z)
  w0,w1[320 each]  parity slack: sum_y s = c + 2*(w0 + 2*w1)
  t[1600]   theta output bits (after adding D)

Round function as constraints (degree <= 4):
  parity:   sum_y s[x,y,z] - c - 2w0 - 4w1 = 0             (+ bools on c,w)
  theta:    t = s XOR d,  d = c[x-1,z] XOR c[x+1,z-1]       (deg 3)
  chi+iota: s_next = chi(rho_pi(t)) XOR rc, gated by the control
            round-active column; the iota constant folds in via the
            precomputed control product column grc = active*rc so the
            gated constraint stays degree 4.
  s bits on input rows are booleanity-constrained; later rows inherit
  booleanity from the (boolean-valued) transition expressions.

v1 claim binding: the proof commits the permutation trace; the
(inputs -> outputs) claims digest is computed host-side from the same
trace (zeth_tpu.recursion resolve-machinery binding is a later round,
like the reference's assumption receipts).
"""

from __future__ import annotations

import numpy as np

from ..hash.keccak import _PI_ROT, _PI_SRC, _RC
from ..zkp import proof as proof_mod
from ..zkp import prover as prover_mod
from ..zkp import verifier as verifier_mod
from ..zkp.air import Air

ROWS_PER_PERM = 32
ROUNDS = 24

# main column offsets
S_OFF = 0
C_OFF = 1600
W0_OFF = C_OFF + 320
W1_OFF = W0_OFF + 320
T_OFF = W1_OFF + 320
N_MAIN = T_OFF + 1600

# control: is_input, rnd_active, grc[64] (= rnd_active * iota rc bit z)
CT_INPUT, CT_ACTIVE = 0, 1
CT_GRC = 2
N_CONTROL = 2 + 64


def _s_col(lane: int, z: int) -> int:
    return S_OFF + lane * 64 + z


def _c_col(x: int, z: int) -> int:
    return C_OFF + x * 64 + z


def _t_col(lane: int, z: int) -> int:
    return T_OFF + lane * 64 + z


# chi reads b[x,y,z] where b[j] = rotl64(t[PI_SRC[j]], PI_ROT[j]):
# b[j] bit z = t[PI_SRC[j]] bit (z - PI_ROT[j]) mod 64
def _b_col(lane: int, z: int) -> int:
    return _t_col(int(_PI_SRC[lane]), (z - int(_PI_ROT[lane])) % 64)


class KeccakAir(Air):
    """Batch of keccak-f[1600] permutations, 32 rows each."""

    name = "keccak-f1600"
    control_cols = N_CONTROL
    main_cols = N_MAIN
    aux_cols = 0
    n_challenges = 0

    def control_trace(self, po2: int) -> np.ndarray:
        n = 1 << po2
        cols = np.zeros((n, N_CONTROL), dtype=np.uint64)
        r = np.arange(n) % ROWS_PER_PERM
        cols[:, CT_INPUT] = r == 0
        cols[:, CT_ACTIVE] = r < ROUNDS
        for z in range(64):
            rc_bits = np.array([(_RC[int(rr)] >> z) & 1 if rr < ROUNDS else 0
                                for rr in r], dtype=np.uint64)
            cols[:, CT_GRC + z] = rc_bits * cols[:, CT_ACTIVE]
        return cols

    # -- witgen ------------------------------------------------------------

    @staticmethod
    def witgen(states: np.ndarray, po2: int) -> tuple[np.ndarray, list]:
        """states: (nperm, 25) uint64 inputs -> (main_std (n, cols), publics).

        Replays the rounds in vectorized numpy, recording the per-round
        state/parity/theta bits.
        """
        n = 1 << po2
        assert states.shape[0] * ROWS_PER_PERM <= n
        # pad with zero-state permutations so every 32-row block is a real
        # permutation (empty "active" rows would violate the iota constraint)
        full = n // ROWS_PER_PERM
        states = np.concatenate(
            [states, np.zeros((full - states.shape[0], 25), np.uint64)])
        nperm = full
        m = np.zeros((n, N_MAIN), dtype=np.uint8)

        a = states.astype(np.uint64).copy()    # (p, 25)

        def put_bits(rows, off, lanes):
            """lanes: (p, k) uint64 -> 64 bit cols each at rows (p,)."""
            for li in range(lanes.shape[1]):
                for z in range(64):
                    m[rows, off + li * 64 + z] = \
                        (lanes[:, li] >> np.uint64(z)) & np.uint64(1)

        rot = lambda v, k: (v << np.uint64(k % 64)) | (v >> np.uint64(
            (64 - k) % 64)) if k % 64 else v

        # rounds 0..23 advance the state; row 24 (the output row) also gets
        # its parity/theta columns so the ungated constraints hold there
        for rnd in range(ROUNDS + 1):
            rows = np.arange(nperm) * ROWS_PER_PERM + rnd
            put_bits(rows, S_OFF, a)
            # theta parities + slack
            for x in range(5):
                for z in range(64):
                    s = sum(((a[:, x + 5 * y] >> np.uint64(z)) & np.uint64(1))
                            for y in range(5))
                    bit = s & np.uint64(1)
                    slack = (s - bit) >> np.uint64(1)      # 0..2
                    m[rows, _c_col(x, z)] = bit
                    m[rows, W0_OFF + x * 64 + z] = slack & np.uint64(1)
                    m[rows, W1_OFF + x * 64 + z] = slack >> np.uint64(1)
            # theta output
            cpar = np.zeros((nperm, 5), dtype=np.uint64)
            for x in range(5):
                cx = a[:, x] ^ a[:, x + 5] ^ a[:, x + 10] ^ a[:, x + 15] ^ a[:, x + 20]
                cpar[:, x] = cx
            d = np.zeros((nperm, 5), dtype=np.uint64)
            for x in range(5):
                d[:, x] = cpar[:, (x - 1) % 5] ^ rot(cpar[:, (x + 1) % 5], 1)
            t = a.copy()
            for lane in range(25):
                t[:, lane] ^= d[:, lane % 5]
            put_bits(rows, T_OFF, t)
            if rnd == ROUNDS:
                break
            # rho+pi, chi, iota -> next round state
            b = np.zeros_like(t)
            for j in range(25):
                b[:, j] = rot(t[:, int(_PI_SRC[j])], int(_PI_ROT[j]))
            nxt = np.zeros_like(b)
            for x in range(5):
                for y in range(5):
                    nxt[:, x + 5 * y] = b[:, x + 5 * y] ^ (
                        ~b[:, (x + 1) % 5 + 5 * y] & b[:, (x + 2) % 5 + 5 * y])
            nxt[:, 0] ^= np.uint64(_RC[rnd])
            a = nxt
        return m.astype(np.uint64), []

    # -- constraints -------------------------------------------------------

    def constraints(self, v, ops, publics, challenges):
        add, sub, mul = ops.add, ops.sub, ops.mul
        one = ops.const(1)
        two = ops.const(2)
        cs = []

        def boolc(e):
            return mul(e, sub(e, one))

        is_input = v("control", CT_INPUT)
        active = v("control", CT_ACTIVE)

        # input-row state booleanity (later rows inherit from transitions)
        for j in range(1600):
            cs.append(mul(is_input, boolc(v("main", S_OFF + j))))
        # parity slack booleanity
        for off in (C_OFF, W0_OFF, W1_OFF):
            for j in range(320):
                cs.append(boolc(v("main", off + j)))
        # theta parity decomposition
        for x in range(5):
            for z in range(64):
                s = v("main", _s_col(x, z))
                for y in range(1, 5):
                    s = add(s, v("main", _s_col(x + 5 * y, z)))
                rhs = add(v("main", _c_col(x, z)),
                          add(mul(two, v("main", W0_OFF + x * 64 + z)),
                              mul(ops.const(4), v("main", W1_OFF + x * 64 + z))))
                cs.append(sub(s, rhs))
        # theta output: t = s xor d, d = c[x-1,z] xor c[x+1,z-1]
        for lane in range(25):
            x = lane % 5
            for z in range(64):
                c1 = v("main", _c_col((x - 1) % 5, z))
                c2 = v("main", _c_col((x + 1) % 5, (z - 1) % 64))
                d = sub(add(c1, c2), mul(two, mul(c1, c2)))
                s = v("main", _s_col(lane, z))
                want = sub(add(s, d), mul(two, mul(s, d)))
                cs.append(sub(v("main", _t_col(lane, z)), want))
        # chi + iota transition: next-row s = chi(rho_pi(t)) xor rc
        for x in range(5):
            for y in range(5):
                lane = x + 5 * y
                for z in range(64):
                    b0 = v("main", _b_col(lane, z))
                    b1 = v("main", _b_col((x + 1) % 5 + 5 * y, z))
                    b2 = v("main", _b_col((x + 2) % 5 + 5 * y, z))
                    u = mul(sub(one, b1), b2)
                    vexpr = add(b0, mul(u, sub(one, mul(two, b0))))
                    nxt = v("main", _s_col(lane, z), 1)
                    con = mul(active, sub(nxt, vexpr))
                    if lane == 0:
                        grc = v("control", CT_GRC + z)
                        con = sub(con, mul(grc, sub(one, mul(two, vexpr))))
                    cs.append(con)
        return cs


def claims_digest(inputs: np.ndarray, outputs: np.ndarray) -> np.ndarray:
    """Poseidon2 digest over the (input, output) state pairs (16-bit limbs)."""
    from ..hash import poseidon2 as P2
    both = np.concatenate([np.asarray(inputs, np.uint64),
                           np.asarray(outputs, np.uint64)], axis=1)
    limbs = np.stack([(both >> np.uint64(16 * i)) & np.uint64(0xFFFF)
                      for i in range(4)], axis=-1).reshape(1, -1)
    return P2.hash_rows_np(limbs)[0]


def choose_po2(nperm: int) -> int:
    need = max(nperm * ROWS_PER_PERM, 64)
    return int(np.ceil(np.log2(need)))


def prove_batch(states: np.ndarray):
    """Prove a batch of keccak-f applications; returns (seal, claims)."""
    from ..hash.keccak import permute_np
    air = KeccakAir()
    po2 = choose_po2(states.shape[0])
    main, publics = KeccakAir.witgen(states, po2)
    pf = prover_mod.prove(air, main, publics)
    outs = permute_np(states)
    return proof_mod.encode(pf), claims_digest(states, outs)


def verify_batch(seal) -> None:
    pf = proof_mod.decode(seal)
    verifier_mod.verify(KeccakAir(), pf, pf.publics)
