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
        """Mix a flat vector of field elements (hashed to a digest first).

        Long vectors hash as a 64-wide tree: chunk rows hash in one
        batched sponge call, their digests recurse. A flat absorb of k
        elements costs k/16 *sequential* host permutations; the tree
        costs O(log) batched calls — this is on both the prover's and
        verifier's critical path (tap mixing is ~2k elements).
        """
        flat = np.asarray(values, dtype=np.uint64).reshape(-1)
        while flat.shape[0] > 64:
            k = (flat.shape[0] + 63) // 64
            padded = np.zeros(k * 64, dtype=np.uint64)
            padded[:flat.shape[0]] = flat
            digests = P2.hash_rows_np(padded.reshape(k, 64))
            flat = digests.reshape(-1)
        self.mix(P2.hash_rows_np(flat[None])[0])

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
        """Index in [0, n) for power-of-two n <= 2^27: one sample mod n.

        Since n | 2^27 and p = 15*2^27 + 1, ``v % n`` is uniform up to a
        single extra residue (bias exactly 1/p < 2^-30 per draw —
        cryptographically negligible). The rule is deliberately
        *straight-line* (one draw, no rejection loop) so the recursion
        circuit's in-circuit verifier can replay it with a fixed-shape
        program: decompose v into 31 bits (hi nibble = 15 forces the low
        27 bits to zero, making the decomposition unique below p) and
        take the low log2(n) bits.
        """
        assert n & (n - 1) == 0 and n <= (1 << 27)
        return self.sample() % n

    # -- proof-of-work grinding ---------------------------------------------
    #
    # The prover searches a nonce whose transcript-mix makes the next
    # sampled element end in `bits` zero bits; the verifier replays the
    # mix and checks. Sampled *before* the FRI query indices, this adds
    # `bits` of grinding security to the query phase (the reference's
    # ~100-bit figure includes PoW grinding — SURVEY.md §2.2 risc0-zkp).

    def grind(self, bits: int) -> int:
        """Find, mix, and return a PoW nonce (device batch search).

        The batch covers the full expected search space (2^bits) so the
        search is one dispatch in the common case — 16 sequential
        round-trips at 2^16 cost ~0.5 s over the tunneled chip."""
        mask = (1 << bits) - 1
        batch = _GRIND_BATCH
        base = 0
        while True:
            hit = int(_grind_batch(jnp_pool(self.pool),
                                   np.uint32(base), bits))
            if hit != 0xFFFFFFFF:
                nonce = base + hit
                self.mix_values(np.array([nonce], dtype=np.uint64))
                v = self.sample()
                assert v & mask == 0
                return nonce
            base += batch

    def check_grind(self, bits: int, nonce: int) -> bool:
        """Verifier side: replay the nonce mix; True iff the PoW holds."""
        self.mix_values(np.array([int(nonce)], dtype=np.uint64))
        return self.sample() & ((1 << bits) - 1) == 0


# -- device grind kernel ------------------------------------------------------


def jnp_pool(pool: np.ndarray):
    import jax.numpy as jnp
    return jnp.asarray(
        ((np.asarray(pool, np.uint64) << np.uint64(32)) % np.uint64(P))
        .astype(np.uint32))


_GRIND_BATCH = 1 << 20


def _grind_batch_impl(pool_monty, base, bits: int):
    import jax.numpy as jnp
    from .. import field as F
    batch = _GRIND_BATCH
    nonces = base + jnp.arange(batch, dtype=jnp.uint32)
    nonce_m = F.to_monty(nonces)
    # emulate mix_values([nonce]) + the first squeeze block, batched
    digests = P2.hash_rows(nonce_m[:, None])                       # (b, 8)
    pools = P2.hash_pairs(jnp.broadcast_to(pool_monty, (batch, 8)), digests)
    state = jnp.zeros((P2.CELLS, batch), jnp.uint32).at[:8].set(pools.T)
    first = F.from_monty(P2.permute(state)[0])
    ok = (first & jnp.uint32((1 << bits) - 1)) == 0
    return jnp.where(ok.any(), jnp.argmax(ok).astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))


_GRIND_JIT = None


def _grind_batch(pool_monty, base, bits: int):
    global _GRIND_JIT
    if _GRIND_JIT is None:
        import jax
        _GRIND_JIT = jax.jit(_grind_batch_impl, static_argnames=("bits",))
    return _GRIND_JIT(pool_monty, base, bits)
