"""Fiat-Shamir transcript: Poseidon2 duplex sponge (host, numpy).

Replaces the IOP read/write + RNG machinery of risc0-zkp 3.0.2
(SURVEY.md §2.2 — Fiat-Shamir ordering is hard part #2 in SURVEY §7.4).
Both prover (host orchestration between device stages) and verifier run
this exact object; PROTOCOL.md documents the encoding.

State: an 8-element "pool". mix(digest) folds a commitment in with one
permutation; sampling squeezes counter-indexed blocks so any number of
challenges can be drawn between commitments without extra mixing.
"""

from __future__ import annotations

import numpy as np

from ..field import P
from ..hash import poseidon2 as P2


class Transcript:
    def __init__(self, domain_tag: str = "zeth-tpu:proof:v1"):
        # pool <- hash of the domain tag bytes (as little-endian u32 field elems)
        raw = domain_tag.encode()
        raw += b"\x00" * (-len(raw) % 4)
        words = np.frombuffer(raw, dtype="<u4").astype(np.uint64) % np.uint64(P)
        self.pool = P2.hash_rows_np(words[None])[0]
        self._counter = 0
        self._buf: list[int] = []

    def mix(self, digest: np.ndarray) -> None:
        """Fold an 8-element digest into the pool; resets the squeeze state."""
        digest = np.asarray(digest, dtype=np.uint64)
        assert digest.shape == (P2.DIGEST_LEN,)
        self.pool = P2.hash_pairs_np(self.pool[None], digest[None])[0]
        self._counter = 0
        self._buf = []

    def mix_values(self, values: np.ndarray) -> None:
        """Mix a flat vector of field elements (hashed to a digest first)."""
        flat = np.asarray(values, dtype=np.uint64).reshape(1, -1)
        self.mix(P2.hash_rows_np(flat)[0])

    def mix_u32_words(self, words: np.ndarray) -> None:
        """Mix raw u32 words (e.g. serialized journal bytes): split to 16-bit
        halves so every mixed value is a canonical field element."""
        w = np.asarray(words, dtype=np.uint64)
        halves = np.stack([w & 0xFFFF, w >> np.uint64(16)], axis=-1).reshape(-1)
        self.mix_values(halves)

    def _squeeze_block(self) -> None:
        state = np.zeros((P2.CELLS, 1), dtype=np.uint64)
        state[:P2.DIGEST_LEN, 0] = self.pool
        state[P2.DIGEST_LEN, 0] = self._counter
        out = P2.permute_np(state)[:, 0]
        self._counter += 1
        self._buf = [int(v) for v in out[:P2.RATE]]

    def sample(self) -> int:
        """One uniform base-field element."""
        if not self._buf:
            self._squeeze_block()
        return self._buf.pop(0)

    def sample_vec(self, k: int) -> np.ndarray:
        return np.array([self.sample() for _ in range(k)], dtype=np.uint64)

    def sample_ext(self) -> np.ndarray:
        """One extension element, shape (4,)."""
        return self.sample_vec(4)

    def sample_index(self, n: int) -> int:
        """Uniform index in [0, n) for power-of-two n <= 2^27."""
        assert n & (n - 1) == 0 and n <= (1 << 27)
        return self.sample() % n
