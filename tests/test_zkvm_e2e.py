"""Full zkVM pipeline: execute -> prove segments -> verify receipt.

Gated behind ZETH_E2E=1: the rv32im quotient jit takes ~15 minutes of
one-time XLA CPU compilation, far beyond the default suite budget. The
driver bench (bench.py) exercises the same path on the real chip.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ZETH_E2E", "0") != "1",
    reason="slow e2e (set ZETH_E2E=1): one-time rv32im circuit compile")


def test_local_prove_and_verify_roundtrip():
    from zeth_tpu import zkvm
    from zeth_tpu.executor import compute_image_id, guests

    elf = guests.echo_input(16)
    env = zkvm.ExecutorEnv.builder().write_slice(bytes(range(16))).build()
    info = zkvm.LocalProver().prove(env, elf)
    assert info.receipt.journal == bytes(range(16))
    info.receipt.verify(compute_image_id(elf))
    with pytest.raises(zkvm.VerificationError):
        info.receipt.verify(compute_image_id(guests.echo_input(17)))


def test_dev_mode_receipt_rejected_without_dev_env(monkeypatch):
    from zeth_tpu import zkvm
    from zeth_tpu.executor import compute_image_id, guests

    elf = guests.sum_loop(10)
    monkeypatch.setenv("ZETH_DEV_MODE", "1")
    info = zkvm.default_prover().prove(
        zkvm.ExecutorEnv.builder().build(), elf)
    assert isinstance(info.receipt.inner, zkvm.FakeInner)
    info.receipt.verify(compute_image_id(elf))
    monkeypatch.delenv("ZETH_DEV_MODE")
    with pytest.raises(zkvm.VerificationError):
        info.receipt.verify(compute_image_id(elf))


def test_keccak_accelerator_prove_and_verify():
    import numpy as np
    from zeth_tpu.circuits.keccak import prove_batch, verify_batch
    from zeth_tpu.hash.keccak import permute_np

    states = np.random.default_rng(9).integers(
        0, 2**64, (2, 25), dtype=np.uint64)
    seal, claims = prove_batch(states)
    words = verify_batch(seal)
    # the proof-bound IO matches the actual permutation
    outs = permute_np(states)
    assert words[50] == int(outs[0, 0]) & 0xFFFFFFFF
    bad = seal.copy()
    bad[2000] ^= 1
    with pytest.raises(Exception):
        verify_batch(bad)


def test_keccak_guest_accelerator_linked():
    """Full resolve path: the guest's keccak syscalls are proven by the
    accelerator batch, whose RLC-bound IO must match the rv32im
    segments' bound IO stream at Receipt.verify."""
    from zeth_tpu import zkvm
    from zeth_tpu.executor import compute_image_id, guests

    elf = guests.keccak_guest(2)
    info = zkvm.LocalProver().prove(zkvm.ExecutorEnv.builder().build(), elf)
    assert info.receipt.inner.keccak_seal is not None
    info.receipt.verify(compute_image_id(elf))
    # dropping the accelerator seal falls back to host recompute (still ok)
    info.receipt.inner.keccak_seal = None
    info.receipt.verify(compute_image_id(elf))


def test_bigint_accelerator_resolve_roundtrip():
    """A guest using the bigint syscall proves end-to-end; the attached
    accelerator seal discharges the segment's bigint claims (resolve),
    and a receipt with a forged accelerator seal is rejected."""
    from zeth_tpu import zkvm
    from zeth_tpu.executor import compute_image_id, guests

    a, b, m = 1234567, 7654321, (1 << 31) - 1
    elf = guests.bigint_guest(a, b, m, reps=2)
    env = zkvm.ExecutorEnv.builder().build()
    info = zkvm.LocalProver().prove(env, elf)
    assert info.receipt.inner.bigint_seal is not None
    want = a * b % m
    want = want * b % m
    assert int.from_bytes(info.receipt.journal, "little") == want
    info.receipt.verify(compute_image_id(elf))
    bad = info.receipt.inner.bigint_seal.copy()
    bad[100] ^= 1
    info.receipt.inner.bigint_seal = bad
    with pytest.raises(zkvm.VerificationError):
        info.receipt.verify(compute_image_id(elf))


def test_sha256_accelerator_resolve_roundtrip():
    """A guest using the sha-256 syscall proves end-to-end; the attached
    accelerator seal discharges the segment's sha claims (resolve)."""
    import hashlib

    import numpy as np

    from zeth_tpu import zkvm
    from zeth_tpu.executor import compute_image_id, guests
    from zeth_tpu.hash.sha256 import IV, pad_message

    block = [int(w) for w in pad_message(b"abc")[0]]
    elf = guests.sha256_guest([int(w) for w in IV], block)
    info = zkvm.LocalProver().prove(zkvm.ExecutorEnv.builder().build(), elf)
    assert info.receipt.inner.sha_seal is not None
    want = hashlib.sha256(b"abc").digest()
    got = b"".join(int.from_bytes(info.receipt.journal[4 * i:4 * i + 4],
                                  "little").to_bytes(4, "big")
                   for i in range(8))
    assert got == want
    info.receipt.verify(compute_image_id(elf))
    bad = info.receipt.inner.sha_seal.copy()
    bad[100] ^= 1
    info.receipt.inner.sha_seal = bad
    with pytest.raises(zkvm.VerificationError):
        info.receipt.verify(compute_image_id(elf))


def test_succinct_receipt_roundtrip(monkeypatch):
    """ZETH_SUCCINCT=1: a multi-segment execution aggregates to ONE root
    recursion proof over the (segment, paging) lift pair tree; receipt
    verification is a single STARK verify + host claim hashing. Forged
    companion bindings are rejected."""
    import numpy as np

    from zeth_tpu import zkvm
    from zeth_tpu.executor import compute_image_id, guests

    monkeypatch.setenv("ZETH_SUCCINCT", "1")
    elf = guests.echo_input(8)
    env = zkvm.ExecutorEnv.builder().write_slice(bytes(range(8))).build()
    info = zkvm.LocalProver().prove(env, elf)
    inner = info.receipt.inner
    assert inner.kind == "succinct"
    info.receipt.verify(compute_image_id(elf))

    # forged d0 binding: the pair claim no longer matches the root
    x0 = inner.segment_extras[0]
    inner.segment_extras[0] = (x0[0],
                               (x0[1] + np.uint64(1)) % np.uint64(2**31),
                               x0[2], x0[3], x0[4])
    with pytest.raises(zkvm.VerificationError):
        info.receipt.verify(compute_image_id(elf))
    inner.segment_extras[0] = x0

    # forged paging public (post root limb): claim/chain breaks
    inner.paging_publics[0] = list(inner.paging_publics[0])
    inner.paging_publics[0][32] ^= 1
    with pytest.raises(zkvm.VerificationError):
        info.receipt.verify(compute_image_id(elf))
