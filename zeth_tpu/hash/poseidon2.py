"""Batched Poseidon2 permutation over Baby Bear (width 24, x^7 S-box).

Replaces the Poseidon2 hash suite of risc0-zkp 3.0.2 (SURVEY.md §2.2:
width 24, 8 full + 21 partial rounds, 8-element digests). The reference's
constants live in an unmounted pinned crate, so this implementation uses
the *same structure and security parameters* with its own deterministic
nothing-up-my-sleeve constants (SHA-256 counter-mode expansion, rejection
sampled into the field) — self-consistent across prover and verifier.

Structure (Poseidon2 paper, public):
  state <- M_E * state                      (initial external layer)
  4 external rounds: +RC, x^7 all cells, M_E
  21 internal rounds: +RC[0], x^7 cell 0, M_I
  4 external rounds
where M_E = circ(2*M4, M4, ..., M4) built from the public 4x4 M4 matrix,
and M_I = J + diag(mu_i - 1) (all-ones plus diagonal).

TPU-native layout: state is **cells-first** ``(24, batch)`` so the batch
rides the 128-wide VPU lane axis; all 24-cell mixing is over the small
sublane axis. Everything is uint32 Montgomery form and fuses under jit.

Device entry points: permute / hash_rows / hash_pairs (Montgomery in/out).
Host ground truth: *_np variants (numpy uint64, standard form).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np

import jax
import jax.numpy as jnp

from .. import field as F
from .. import hostmath as H
from ..field import P

CELLS = 24          # permutation width t
RATE = 16           # sponge rate
CAPACITY = 8        # sponge capacity
DIGEST_LEN = 8      # digest = first 8 cells
ROUNDS_FULL = 8     # external rounds (4 + 4)
ROUNDS_PARTIAL = 21 # internal rounds
SBOX_EXP = 7        # gcd(7, p-1) = 1

_U32 = jnp.uint32

# The public Poseidon2 4x4 building block (Poseidon2 paper, §5.1).
_M4 = np.array(
    [[5, 7, 1, 3],
     [4, 6, 1, 1],
     [1, 3, 5, 7],
     [1, 1, 4, 6]], dtype=np.uint64)


def _derive(tag: str, count: int) -> list[int]:
    """Deterministic field elements: SHA-256("zeth-tpu:poseidon2:<tag>:<ctr>")."""
    out: list[int] = []
    ctr = 0
    while len(out) < count:
        h = hashlib.sha256(f"zeth-tpu:poseidon2:babybear:{tag}:{ctr}".encode()).digest()
        for i in range(0, 32, 4):
            v = int.from_bytes(h[i:i + 4], "little") & 0x7FFFFFFF
            if v < P and len(out) < count:
                out.append(v)
        ctr += 1
    return out


def _mat_det_mod_p(m: np.ndarray) -> int:
    """Determinant mod p via fraction-free Gaussian elimination (python ints)."""
    a = [[int(x) % P for x in row] for row in m]
    n = len(a)
    det = 1
    for col in range(n):
        piv = next((r for r in range(col, n) if a[r][col] % P), None)
        if piv is None:
            return 0
        if piv != col:
            a[col], a[piv] = a[piv], a[col]
            det = P - det
        det = det * a[col][col] % P
        inv = pow(a[col][col], P - 2, P)
        for r in range(col + 1, n):
            f = a[r][col] * inv % P
            for c in range(col, n):
                a[r][c] = (a[r][c] - f * a[col][c]) % P
    return det


@functools.lru_cache(maxsize=1)
def constants() -> dict:
    """Round constants + internal diagonal (standard form, host ints)."""
    rc_ext = np.array(_derive("rc-external", ROUNDS_FULL * CELLS),
                      dtype=np.uint64).reshape(ROUNDS_FULL, CELLS)
    rc_int = np.array(_derive("rc-internal", ROUNDS_PARTIAL), dtype=np.uint64)
    # Internal diagonal: rejection-resample until M_I = J + diag(mu-1) is
    # invertible and the mu_i are pairwise distinct and nonzero.
    salt = 0
    while True:
        mu = _derive(f"int-diag:{salt}", CELLS)
        if len(set(mu)) == CELLS and all(m not in (0, 1) for m in mu):
            m_i = np.ones((CELLS, CELLS), dtype=np.uint64)
            for i, m in enumerate(mu):
                m_i[i, i] = m
            if _mat_det_mod_p(m_i) != 0:
                break
        salt += 1
    return {
        "rc_ext": rc_ext,
        "rc_int": rc_int,
        "diag": np.array(mu, dtype=np.uint64),
    }


# ---------------------------------------------------------------------------
# Host ground truth (numpy uint64, standard form)
# ---------------------------------------------------------------------------


def _m4_block_np(x: np.ndarray) -> np.ndarray:
    """Apply M4 to each 4-cell block. x: (24, ...)."""
    out = np.empty_like(x)
    for b in range(CELLS // 4):
        blk = x[4 * b:4 * b + 4]
        out[4 * b:4 * b + 4] = np.tensordot(_M4, blk, axes=(1, 0)) % H.PU
    return out


def _external_np(x: np.ndarray) -> np.ndarray:
    """M_E = circ(2*M4, M4, ...): per-block M4, then add the block-sum."""
    z = _m4_block_np(x)
    s = np.zeros((4,) + x.shape[1:], dtype=np.uint64)
    for b in range(CELLS // 4):
        s = (s + z[4 * b:4 * b + 4]) % H.PU
    for b in range(CELLS // 4):
        z[4 * b:4 * b + 4] = (z[4 * b:4 * b + 4] + s) % H.PU
    return z


def _sbox_np(x: np.ndarray) -> np.ndarray:
    x2 = H.fmul(x, x)
    x4 = H.fmul(x2, x2)
    return H.fmul(H.fmul(x4, x2), x)


def permute_np(state: np.ndarray) -> np.ndarray:
    """Poseidon2 permutation, host ground truth. state: (24, ...) standard form."""
    c = constants()
    rc_ext, rc_int, diag = c["rc_ext"], c["rc_int"], c["diag"]
    x = np.asarray(state, dtype=np.uint64) % H.PU
    x = _external_np(x)
    half = ROUNDS_FULL // 2
    for r in range(half):
        x = (x + rc_ext[r].reshape((CELLS,) + (1,) * (x.ndim - 1))) % H.PU
        x = _external_np(_sbox_np(x))
    for r in range(ROUNDS_PARTIAL):
        x[0] = (x[0] + rc_int[r]) % H.PU
        x[0] = _sbox_np(x[0])
        s = x.sum(axis=0) % H.PU  # 24 * (p-1) < 2^36 fits uint64
        x = (s[None] + H.fmul(x, (diag - 1).reshape((CELLS,) + (1,) * (x.ndim - 1)) % H.PU)) % H.PU
    for r in range(half, ROUNDS_FULL):
        x = (x + rc_ext[r].reshape((CELLS,) + (1,) * (x.ndim - 1))) % H.PU
        x = _external_np(_sbox_np(x))
    return x


def hash_rows_np(rows: np.ndarray) -> np.ndarray:
    """Sponge-hash rows of field elements. rows: (n, k) -> digests (n, 8)."""
    rows = np.asarray(rows, dtype=np.uint64) % H.PU
    n, k = rows.shape
    state = np.zeros((CELLS, n), dtype=np.uint64)
    for off in range(0, max(k, 1), RATE):
        chunk = rows[:, off:off + RATE].T
        state[:chunk.shape[0]] = (state[:chunk.shape[0]] + chunk) % H.PU
        state = permute_np(state)
    return state[:DIGEST_LEN].T.copy()


# Domain-separation tag for 2-to-1 (inner node) compression: a sponge
# leaf hash runs with an all-zero capacity, so tagging a capacity cell
# makes an inner-node digest never collide with any leaf hash (a leaf
# row equal to the concatenation of two child digests would otherwise
# hash identically — ADVICE.md r1 finding #2).
PAIR_TAG = 1


def hash_pairs_np(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Combine digest pairs: (n, 8) x (n, 8) -> (n, 8) in one permutation."""
    n = left.shape[0]
    state = np.zeros((CELLS, n), dtype=np.uint64)
    state[:DIGEST_LEN] = np.asarray(left, dtype=np.uint64).T % H.PU
    state[DIGEST_LEN:2 * DIGEST_LEN] = np.asarray(right, dtype=np.uint64).T % H.PU
    state[2 * DIGEST_LEN] = PAIR_TAG
    return permute_np(state)[:DIGEST_LEN].T.copy()


# ---------------------------------------------------------------------------
# Device kernels (uint32 Montgomery, cells-first (24, batch))
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _monty_constants() -> dict:
    c = constants()
    to_m = lambda a: ((a.astype(np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)
    return {
        "rc_ext": to_m(c["rc_ext"]),
        "rc_int": to_m(c["rc_int"]),
        "diag_m1": to_m((c["diag"] - 1) % P),
    }


def _dbl(x):
    return F.add(x, x)


def _sbox(x):
    x2 = F.mul(x, x)
    x4 = F.mul(x2, x2)
    return F.mul(F.mul(x4, x2), x)


# The permutation operates on a *tuple of 24 same-shaped arrays* (one per
# cell) rather than a stacked (24, batch) array: every round is then pure
# elementwise ops that XLA fuses, with zero sublane slicing/stacking or
# relayouts inside the round chain (the stacked form cost ~6x on the
# main-group Merkle commit at po2=18). Rounds are statically unrolled.


def _m4_cells(cells):
    outs = []
    for b in range(CELLS // 4):
        x0, x1, x2, x3 = cells[4 * b:4 * b + 4]
        t0 = F.add(x0, x1)
        t1 = F.add(x2, x3)
        t2 = F.add(_dbl(x1), t1)
        t3 = F.add(_dbl(x3), t0)
        t4 = F.add(_dbl(_dbl(t1)), t3)
        t5 = F.add(_dbl(_dbl(t0)), t2)
        t6 = F.add(t3, t5)
        t7 = F.add(t2, t4)
        outs.extend([t6, t5, t7, t4])
    return outs


def _external_cells(cells):
    z = _m4_cells(cells)
    s = list(z[0:4])
    for b in range(1, CELLS // 4):
        for j in range(4):
            s[j] = F.add(s[j], z[4 * b + j])
    return [F.add(z[i], s[i % 4]) for i in range(CELLS)]


def permute_cells(cells):
    """Poseidon2 permutation over a list of 24 same-shaped Montgomery arrays.

    Rounds run under ``lax.scan`` (round constants are the scanned input):
    a fully unrolled round chain executes the same but costs ~50 s of XLA
    compile per batch shape — this body stays ~200 HLO ops.
    """
    mc = _monty_constants()
    rc_ext = jnp.asarray(mc["rc_ext"])
    rc_int = jnp.asarray(mc["rc_int"])
    diag_m1 = mc["diag_m1"]          # numpy: per-cell constants stay scalars
    half = ROUNDS_FULL // 2

    def ext_round(x, rc):
        x = [F.add(x[i], rc[i]) for i in range(CELLS)]
        return tuple(_external_cells([_sbox(c) for c in x])), None

    def int_round(x, rc):
        x = list(x)
        x[0] = _sbox(F.add(x[0], rc))
        t = x
        while len(t) > 1:
            nxt = [F.add(t[i], t[i + 1]) for i in range(0, len(t) - 1, 2)]
            if len(t) % 2:
                nxt.append(t[-1])
            t = nxt
        s = t[0]
        return tuple(F.add(s, F.mul(x[i], jnp.uint32(diag_m1[i])))
                     for i in range(CELLS)), None

    x = tuple(_external_cells(list(cells)))
    x, _ = jax.lax.scan(ext_round, x, rc_ext[:half])
    x, _ = jax.lax.scan(int_round, x, rc_int)
    x, _ = jax.lax.scan(ext_round, x, rc_ext[half:])
    return list(x)


@jax.jit
def permute(state):
    """Poseidon2 permutation on device. state: (24, batch...) uint32 Montgomery."""
    cells = permute_cells([state[i] for i in range(CELLS)])
    return jnp.stack(cells, axis=0)


def _absorb_chunks(cells, chunks):
    """Scan `chunks` (nch, RATE, n) into a 24-cell sponge tuple."""
    def body(cs, chunk):
        cs = tuple(F.add(cs[j], chunk[j]) for j in range(RATE)) + cs[RATE:]
        return tuple(permute_cells(list(cs))), None
    cells, _ = jax.lax.scan(body, cells, chunks)
    return cells


def _zero_cells(n):
    z = jnp.zeros((n,), _U32)
    return tuple(z for _ in range(CELLS))


@jax.jit
def hash_rows(rows):
    """Sponge-hash rows on device. rows: (n, k) Montgomery -> digests (n, 8).

    Matches hash_rows_np on (from_monty o hash o to_monty). The sponge
    absorbs RATE=16 elements per permutation (add-into-rate); zero-padding
    the last chunk is equivalent to the host's partial absorb. The matrix
    transposes ONCE to chunk-major (nch, RATE, n) so every absorb is a
    contiguous slice — per-chunk lane-dim dynamic slices + transposes were
    the dominant relayout cost of the Merkle commit.
    """
    n, k = rows.shape
    nch = max(-(-k // RATE), 1)
    pad = nch * RATE - k
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((n, pad), _U32)], axis=1)
    chunks = rows.T.reshape(nch, RATE, n)
    cells = _absorb_chunks(_zero_cells(n), chunks)
    return jnp.stack(cells[:DIGEST_LEN], axis=0).T


@functools.partial(jax.jit, static_argnums=(3,))
def _absorb_slab(cells, rows, off, c: int):
    """Absorb columns [off, off+c) (c a RATE multiple or the final ragged
    tail, zero-padded) into a sponge-cells tuple. One slab-sized
    transpose; chunks then slice contiguously."""
    n, k = rows.shape
    slab = jax.lax.dynamic_slice(rows, (jnp.int32(0), off), (n, c))
    pad = (-c) % RATE
    if pad:
        slab = jnp.concatenate([slab, jnp.zeros((n, pad), _U32)], axis=1)
    chunks = slab.T.reshape((c + pad) // RATE, RATE, n)
    return _absorb_chunks(cells, chunks)


# Above this many matrix elements, hash_rows streams column slabs through
# separate dispatches so the absorb never holds a second matrix-sized
# buffer (the po2=18 main-group commit OOM'd the 16 GB chip inside one
# whole-matrix XLA program).
STREAM_HASH_ELEMS = 1 << 26
_STREAM_COLS = 256          # multiple of RATE


def hash_rows_large(rows):
    """hash_rows for matrices too big to absorb in one XLA program.
    Bit-identical to hash_rows; sponge cells carry across dispatches."""
    n, k = rows.shape
    cells = _zero_cells(n)
    for off in range(0, max(k, 1), _STREAM_COLS):
        c = min(_STREAM_COLS, k - off)
        cells = _absorb_slab(cells, rows, jnp.int32(off), c)
    return jnp.stack(cells[:DIGEST_LEN], axis=0).T


@jax.jit
def hash_pairs(left, right):
    """Combine digest pairs on device: (n, 8) x (n, 8) -> (n, 8), Montgomery."""
    n = left.shape[0]
    zeros = jnp.zeros((n,), _U32)
    tag = jnp.full((n,), np.uint32((PAIR_TAG << 32) % P), _U32)
    cells = ([left[:, j] for j in range(DIGEST_LEN)]
             + [right[:, j] for j in range(DIGEST_LEN)]
             + [tag] + [zeros] * (CELLS - 2 * DIGEST_LEN - 1))
    out = permute_cells(cells)
    return jnp.stack(out[:DIGEST_LEN], axis=0).T
