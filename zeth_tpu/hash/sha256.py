"""Batched SHA-256 compression as uint32 JAX ops + host helpers.

Replaces the SHA-256 hash suite of risc0-zkp 3.0.2 (SURVEY.md §2.2). The
device kernel processes one 64-byte block per batch lane per call —
enough for Merkle digest-pair combines (64 bytes) and field-row hashing
via chained compressions. Host-side convenience wrappers use hashlib for
transcript-grade hashing of arbitrary byte strings.

Layout: batch leading; per-message state is 8 uint32 words, message block
16 uint32 big-endian words.
"""

from __future__ import annotations

import hashlib

import numpy as np

import jax
import jax.numpy as jnp

_U32 = jnp.uint32

# FIPS 180-4 constants (public).
_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

IV = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


@jax.jit
def compress(state, block):
    """One SHA-256 compression. state: (b, 8), block: (b, 16) uint32 words.

    Message schedule and round function both run under ``lax.scan`` to keep
    the traced program small (this inlines into larger prover jits).
    """
    def sched(win, _):
        w15, w2 = win[:, 1], win[:, 14]
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
        new = win[:, 0] + s0 + win[:, 9] + s1
        return jnp.concatenate([win[:, 1:], new[:, None]], axis=1), new

    _, extra = jax.lax.scan(sched, block, None, length=48)     # (48, b)
    kw = jnp.concatenate([jnp.swapaxes(block, 0, 1), extra], axis=0)
    kw = kw + jnp.asarray(_K)[:, None]                          # (64, b)

    def rnd(s, kwi):
        a, b, c, d, e, f, g, h = (s[:, i] for i in range(8))
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + kwi
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        return jnp.stack([t1 + s0 + maj, a, b, c, d + t1, e, f, g], axis=-1), None

    out, _ = jax.lax.scan(rnd, state, kw)
    return state + out


@jax.jit
def hash_blocks(blocks):
    """Chain-compress multi-block messages. blocks: (b, nblk, 16) -> (b, 8)."""
    b = blocks.shape[0]
    state = jnp.broadcast_to(jnp.asarray(IV), (b, 8)).astype(_U32)
    for i in range(blocks.shape[1]):
        state = compress(state, blocks[:, i])
    return state


@jax.jit
def hash_pairs(left, right):
    """Merkle combine: two 8-word digests -> one compression, no padding.

    Mirrors the fixed-length unpadded Merkle-node hashing style of the
    reference hash suite (single compression of the 64-byte concatenation).
    """
    block = jnp.concatenate([left, right], axis=-1)
    b = block.shape[0]
    state = jnp.broadcast_to(jnp.asarray(IV), (b, 8)).astype(_U32)
    return compress(state, block)


# ---------------------------------------------------------------------------
# Host helpers
# ---------------------------------------------------------------------------


def sha256_bytes(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def words_be(data: bytes) -> np.ndarray:
    assert len(data) % 4 == 0
    return np.frombuffer(data, dtype=">u4").astype(np.uint32)


def digest_to_bytes(words: np.ndarray) -> bytes:
    return np.asarray(words, dtype=">u4").tobytes()


def pad_message(data: bytes) -> np.ndarray:
    """FIPS 180-4 padding -> (nblk, 16) big-endian words."""
    bitlen = len(data) * 8
    data = data + b"\x80"
    while len(data) % 64 != 56:
        data += b"\x00"
    data += bitlen.to_bytes(8, "big")
    return words_be(data).reshape(-1, 16)
