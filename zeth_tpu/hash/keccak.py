"""Batched Keccak-f[1600] permutation with 64-bit lanes as uint32 pairs.

Replaces the Keccak accelerator data path of risc0-circuit-keccak 4.0.2
(SURVEY.md §2.2): the guest's patched tiny-keccak/sha2 route permutations
to the host, which proves them in batches. This kernel is that batch
permutation — the compute core of the keccak accelerator circuit and of
host-side MPT hashing verification.

TPU has no 64-bit integers, so each lane is an (hi, lo) uint32 pair:
state shape ``(batch, 25, 2)`` with [..., 0] = low word, [..., 1] = high
word. Rotations split into pair shifts; XOR/NOT are native uint32 VPU ops.
All 24 rounds unroll and fuse under jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_U32 = jnp.uint32

# Public Keccak constants (FIPS 202).
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# Rotation offsets r[x][y] and the pi permutation, flattened index = x + 5*y.
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


# rho+pi as one fused gather: b[j] = rotl(a[PI_SRC[j]], PI_ROT[j]) where the
# flat lane index is x + 5y and b[y + 5*((2x+3y)%5)] <- a[x + 5y] rot r[x][y].
_PI_SRC = np.zeros(25, dtype=np.int32)
_PI_ROT = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
        _PI_ROT[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _ROT[_x][_y]

_RC_PAIRS = np.array([[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC], dtype=np.uint32)


def _rotl_pairs(lanes, n):
    """Rotate (..., 2) uint32 lane pairs left by per-lane amounts n (mod 64)."""
    n = jnp.asarray(n, jnp.uint32) % 64
    lo, hi = lanes[..., 0], lanes[..., 1]
    swap = n >= 32
    m = n % 32
    l = jnp.where(swap, hi, lo)
    h = jnp.where(swap, lo, hi)
    inv = (32 - m) & 31  # guarded by the m==0 select below
    new_lo = jnp.where(m == 0, l, (l << m) | (h >> inv))
    new_hi = jnp.where(m == 0, h, (h << m) | (l >> inv))
    return jnp.stack([new_lo, new_hi], axis=-1)


@jax.jit
def permute(state):
    """Keccak-f[1600]. state: (batch, 25, 2) uint32 (lane = [lo, hi]).

    Fully vectorized round body under ``lax.scan``: theta via a reshape
    xor-reduce, rho+pi as one gather with per-lane rotations, chi via rolls.
    """
    pi_src = jnp.asarray(_PI_SRC)
    pi_rot = jnp.asarray(_PI_ROT)

    def round_body(a, rc):
        # theta: column parities over y (flat index x + 5y -> grid (y, x))
        grid = a.reshape(a.shape[0], 5, 5, 2)
        c = jax.lax.reduce(grid, np.uint32(0), jax.lax.bitwise_xor, (1,))  # (b, 5(x), 2)
        d = jnp.roll(c, 1, axis=1) ^ _rotl_pairs(jnp.roll(c, -1, axis=1), 1)
        a = (grid ^ d[:, None]).reshape(a.shape[0], 25, 2)
        # rho + pi
        b = _rotl_pairs(a[:, pi_src], pi_rot[None, :])
        # chi on grid (y, x)
        bg = b.reshape(b.shape[0], 5, 5, 2)
        ag = bg ^ (~jnp.roll(bg, -1, axis=2) & jnp.roll(bg, -2, axis=2))
        a = ag.reshape(b.shape[0], 25, 2)
        # iota
        a = a.at[:, 0].set(a[:, 0] ^ rc[None])
        return a, None

    out, _ = jax.lax.scan(round_body, state, jnp.asarray(_RC_PAIRS))
    return out


# ---------------------------------------------------------------------------
# Host reference (numpy uint64) + keccak256 convenience
# ---------------------------------------------------------------------------


def permute_np(state64: np.ndarray) -> np.ndarray:
    """Ground truth Keccak-f[1600]. state64: (batch, 25) uint64."""
    s = state64.astype(np.uint64).copy()
    batch = s.shape[0]
    a = s.reshape(batch, 5, 5)  # a[:, y, x] = lane x + 5y

    def rotl(v, n):
        n %= 64
        if n == 0:
            return v
        return (v << np.uint64(n)) | (v >> np.uint64(64 - n))

    for rnd in range(24):
        c = a[:, 0, :].copy()
        for y in range(1, 5):
            c ^= a[:, y, :]
        d = np.empty_like(c)
        for x in range(5):
            d[:, x] = c[:, (x - 1) % 5] ^ rotl(c[:, (x + 1) % 5], 1)
        for y in range(5):
            a[:, y, :] ^= d
        b = np.empty_like(a)
        for x in range(5):
            for y in range(5):
                b[:, (2 * x + 3 * y) % 5, y] = rotl(a[:, y, x], _ROT[x][y])
        for x in range(5):
            for y in range(5):
                a[:, y, x] = b[:, y, x] ^ (~b[:, y, (x + 1) % 5] & b[:, y, (x + 2) % 5])
        a[:, 0, 0] ^= np.uint64(_RC[rnd])
    return a.reshape(batch, 25)


def split_u64(state64: np.ndarray) -> np.ndarray:
    """(batch, 25) uint64 -> (batch, 25, 2) uint32 [lo, hi]."""
    lo = (state64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (state64 >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=-1)


def join_u64(state32: np.ndarray) -> np.ndarray:
    s = np.asarray(state32, dtype=np.uint64)
    return s[..., 0] | (s[..., 1] << np.uint64(32))


def keccak256(data: bytes) -> bytes:
    """Host keccak-256 (Ethereum's hash), built on permute_np. Rate 136B."""
    rate = 136
    msg = bytearray(data)
    msg.append(0x01)
    while len(msg) % rate != 0:
        msg.append(0x00)
    msg[-1] ^= 0x80
    state = np.zeros((1, 25), dtype=np.uint64)
    for off in range(0, len(msg), rate):
        block = np.frombuffer(bytes(msg[off:off + rate]), dtype="<u8")
        state[0, :rate // 8] ^= block
        state = permute_np(state)
    return state[0, :4].astype("<u8").tobytes()
