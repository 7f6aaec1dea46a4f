"""zkVM host API: executor env, prover dispatch, receipts.

Python surface mirroring the reference's risc0-zkvm host API
(SURVEY.md §2.2: `ExecutorEnvBuilder`, `default_prover()`, dev-mode fake
receipts, `Receipt::verify(image_id)`, journal access — used by the host
at /root/reference/crates/host/src/lib.rs:123-143 and verified at
crates/host/src/bin/cli.rs:100-108).

Dev mode: set ``ZETH_DEV_MODE=1`` (the reference's RISC0_DEV_MODE,
README.md:104-108) — guests execute in the native emulator and a fake
receipt is returned; verification of fake receipts fails unless dev mode
is active in the verifying process too.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np

from .executor import Executor, compute_image_id
from .hash import poseidon2 as P2

DEFAULT_SEGMENT_PO2 = 20


def dev_mode_enabled() -> bool:
    return os.environ.get("ZETH_DEV_MODE", "0").lower() in ("1", "true", "yes")


def to_zkvm_input_bytes(obj) -> bytes:
    """Word-align serialized input (the reference's u32-word serde,
    crates/host/src/lib.rs:150-154). Accepts bytes or str (JSON)."""
    raw = obj if isinstance(obj, bytes) else str(obj).encode()
    raw = len(raw).to_bytes(4, "little") + raw
    return raw + b"\x00" * (-len(raw) % 4)


def from_zkvm_input_bytes(data: bytes) -> bytes:
    n = int.from_bytes(data[:4], "little")
    return data[4:4 + n]


@dataclass
class ExecutorEnv:
    """Input + limits for one guest execution (ExecutorEnvBuilder analog)."""
    input_bytes: bytes = b""
    segment_limit_po2: int = DEFAULT_SEGMENT_PO2

    class Builder:
        def __init__(self):
            self._input = b""
            self._po2 = DEFAULT_SEGMENT_PO2

        def write(self, obj) -> "ExecutorEnv.Builder":
            self._input += to_zkvm_input_bytes(obj)
            return self

        def write_slice(self, raw: bytes) -> "ExecutorEnv.Builder":
            self._input += raw
            return self

        def segment_limit_po2(self, po2: int) -> "ExecutorEnv.Builder":
            self._po2 = po2
            return self

        def build(self) -> "ExecutorEnv":
            return ExecutorEnv(self._input, self._po2)

    @staticmethod
    def builder() -> "ExecutorEnv.Builder":
        return ExecutorEnv.Builder()


@dataclass
class ReceiptClaim:
    """Binding of an execution to its outputs (risc0-binfmt claim analog)."""
    image_id: np.ndarray         # (8,) field elements
    journal_digest: bytes        # sha256 of journal
    exit_code: int

    def digest(self) -> np.ndarray:
        ws = np.frombuffer(self.journal_digest, dtype="<u4").astype(np.uint64)
        halves = np.stack([ws & 0xFFFF, ws >> np.uint64(16)], -1).reshape(-1)
        row = np.concatenate([
            np.asarray(self.image_id, np.uint64), halves,
            np.array([self.exit_code], np.uint64)])
        return P2.hash_rows_np(row[None])[0]


class VerificationError(Exception):
    pass


@dataclass
class FakeInner:
    """Dev-mode inner receipt: no cryptographic content."""
    kind: str = "fake"


@dataclass
class SegmentsInner:
    """One STARK seal per execution segment (pre-recursion aggregation).

    Carries the public program image (bound to the claim's image ID at
    verification time — the rv32im circuit's ROM is built from it) and,
    when the guest used the keccak accelerator, the accelerator batch
    seal whose proof-bound IO discharges the segments' keccak claims
    (the reference's assumption-receipt/resolve role)."""
    seals: list = field(default_factory=list)       # list of np.uint32 seals
    paging_seals: list = field(default_factory=list)  # companion paging seals
    image_addrs: np.ndarray = None
    image_words: np.ndarray = None
    entry_pc: int = 0
    keccak_seal: np.ndarray = None
    bigint_seal: np.ndarray = None
    sha_seal: np.ndarray = None
    kind: str = "segments"


@dataclass
class SuccinctInner:
    """ONE root recursion proof for the whole execution (post lift/join).

    The per-segment publics travel in the clear (they are public); each
    is bound to a lift claim digest, folded up the in-circuit join tree
    to the root proof's 8-element public claim — so verification costs
    ONE STARK verify plus cheap host hashing/chain replay, independent of
    segment count (the reference's succinct receipt, SURVEY.md §2.2
    risc0-circuit-recursion)."""
    root_seal: np.ndarray           # encoded recursion StarkProof
    segment_publics: list           # [segment][...] public values
    segment_po2s: list              # [segment] inner trace po2
    # companion paging bindings, pinned by the pair-joined lift claims
    # (no paging seals travel — the root proof verified them in-circuit)
    segment_extras: list = None     # [(pg_root, d0, d1, g4, g5)]
    paging_po2s: list = None
    paging_publics: list = None
    image_addrs: np.ndarray = None
    image_words: np.ndarray = None
    entry_pc: int = 0
    # in-circuit resolve (reference: recursion "resolve" programs): the
    # accelerator batch proofs were LIFTED into the root fold, so only
    # their claim-pinned publics travel — no accelerator seals, no
    # host-side accelerator STARK verification at receipt time
    accel_publics: list = None      # [(kind, po2, publics ints)]
    kind: str = "succinct"


@dataclass
class Receipt:
    journal: bytes
    claim: ReceiptClaim
    inner: object

    def verify(self, image_id: np.ndarray) -> None:
        image_id = np.asarray(image_id, dtype=np.uint64)
        if hashlib.sha256(self.journal).digest() != self.claim.journal_digest:
            raise VerificationError("journal digest mismatch")
        if not (self.claim.image_id == image_id).all():
            raise VerificationError("image id mismatch")
        if self.claim.exit_code != 0:
            raise VerificationError(f"guest exited with {self.claim.exit_code}")
        if isinstance(self.inner, FakeInner):
            if not dev_mode_enabled():
                raise VerificationError(
                    "fake receipt rejected: dev mode not enabled")
            return
        if isinstance(self.inner, SegmentsInner):
            from .circuits import keccak as keccak_air
            from .circuits import rv32im as rv
            from .executor import image_id_from_parts
            # bind the prover-supplied program image to the claimed image ID
            got = image_id_from_parts(self.inner.entry_pc,
                                      self.inner.image_addrs,
                                      self.inner.image_words)
            if not (got == np.asarray(self.claim.image_id, np.uint64)).all():
                raise VerificationError("program image does not match image id")
            # resolve: an accelerator seal discharges the keccak claims
            acc_words, big_io, sha_io = _resolve_accelerators(self.inner)
            out = rv.verify_segments(
                self.inner.seals, self.inner.paging_seals, self.claim,
                self.inner.image_addrs,
                self.inner.image_words, self.inner.entry_pc,
                keccak_checked=acc_words is not None,
                bigint_checked=big_io is not None,
                sha_checked=sha_io is not None)
            _check_accelerator_io(out, acc_words, big_io, sha_io)
            return
        if isinstance(self.inner, SuccinctInner):
            from .circuits import keccak as keccak_air
            from .circuits import rv32im as rv
            from .executor import image_id_from_parts
            from .recursion import succinct
            from .zkp import proof as proof_mod
            from .zkp import verifier as verifier_mod
            got = image_id_from_parts(self.inner.entry_pc,
                                      self.inner.image_addrs,
                                      self.inner.image_words)
            if not (got == np.asarray(self.claim.image_id, np.uint64)).all():
                raise VerificationError("program image does not match image id")
            air = rv.Rv32imAir(self.inner.image_addrs,
                               self.inner.image_words)
            # succinct paging resolve: the (segment, paging) lift pairs
            # were joined in-circuit — the root claim pins every segment
            # proof, its paging proof (via the shared paging main root),
            # and the cross-bound d0/d1/g4/g5. Verification is ONE root
            # STARK + host claim hashing; the page-tree roots then chain
            # in verify_chain below.
            from .circuits.paging import PagingAir
            pg_air = PagingAir()
            inner = self.inner
            if not (len(inner.segment_publics)
                    == len(inner.segment_extras or [])
                    == len(inner.paging_po2s or [])
                    == len(inner.paging_publics or [])):
                raise VerificationError(
                    "succinct receipt: paging binding count mismatch")
            paging_pubs_list = [[int(p) for p in ps]
                                for ps in inner.paging_publics]
            from .circuits import bigint2 as bigint_air_mod
            from .circuits import keccak as keccak_air_mod
            from .circuits import sha256 as sha_air_mod
            _ACCEL_AIRS = {"keccak": keccak_air_mod.KeccakAir,
                           "bigint": bigint_air_mod.Bigint2Air,
                           "sha": sha_air_mod.Sha256Air}
            accel = []
            seen_kinds = set()
            for kind, a_po2, a_pub in (inner.accel_publics or []):
                if kind not in _ACCEL_AIRS:
                    raise VerificationError(
                        f"unknown accelerator claim kind {kind!r}")
                if kind in seen_kinds:
                    # one batch per kind (prover contract): a duplicate
                    # would silently shadow the first IO stream below
                    raise VerificationError(
                        f"duplicate accelerator claim kind {kind!r}")
                seen_kinds.add(kind)
                accel.append((_ACCEL_AIRS[kind](), a_po2,
                              [int(p) for p in a_pub]))
            root = succinct.RecReceipt(
                proof=proof_mod.decode(inner.root_seal),
                claim=None, node=None)
            root.claim = np.asarray(root.proof.publics, np.uint64)
            try:
                succinct.verify_root_segments(
                    root, air, inner.segment_po2s, inner.segment_publics,
                    inner.segment_extras, pg_air, inner.paging_po2s,
                    paging_pubs_list,
                    [x[0] for x in inner.segment_extras],
                    accel=accel)
            except (verifier_mod.VerificationError, ValueError) as e:
                raise VerificationError(f"succinct receipt: {e}") from e
            # in-circuit resolve: the root proof already verified every
            # accelerator batch; extract the claim-pinned IO streams
            # from the publics (no accelerator STARK checks here)
            acc_words = big_io = sha_io = None
            try:
                for kind, a_po2, a_pub in (inner.accel_publics or []):
                    if kind == "keccak":
                        acc_words = keccak_air_mod.parse_publics(a_pub)
                    elif kind == "bigint":
                        big_io = []
                        for a, b, m, r in bigint_air_mod.parse_publics(
                                a_pub):
                            for v in (a, b, m, r):
                                big_io += [(v >> (32 * w)) & 0xFFFFFFFF
                                           for w in range(12)]
                    elif kind == "sha":
                        sha_io = []
                        for st, blk, outw in sha_air_mod.parse_publics(
                                a_pub):
                            sha_io += list(st) + list(blk) + list(outw)
            except ValueError as e:
                raise VerificationError(
                    f"accelerator claim publics: {e}") from e
            out = rv.verify_chain(
                self.inner.segment_publics, self.claim,
                self.inner.image_addrs, self.inner.image_words,
                self.inner.entry_pc,
                paging_publics_list=paging_pubs_list,
                keccak_checked=acc_words is not None,
                bigint_checked=big_io is not None,
                sha_checked=sha_io is not None)
            _check_accelerator_io(out, acc_words, big_io, sha_io)
            return
        raise VerificationError(f"unknown receipt kind: {self.inner!r}")


@dataclass
class SessionStats:
    user_cycles: int
    paging_cycles: int
    total_cycles: int
    keccak_calls: int
    segments: int


@dataclass
class ProveInfo:
    receipt: Receipt
    stats: SessionStats




def _resolve_accelerators(inner):
    """Verify attached accelerator batch seals (the reference's resolve
    step): returns (keccak_io | None, bigint_io | None, sha_io | None)
    as the segments' 32-bit word streams."""
    from .circuits import bigint2 as bigint_air
    from .circuits import keccak as keccak_air
    from .circuits import sha256 as sha_air
    acc_words = None
    if inner.keccak_seal is not None:
        try:
            acc_words = keccak_air.verify_batch(inner.keccak_seal)
        except Exception as e:
            raise VerificationError(f"keccak accelerator seal: {e}") from e
    big_io = None
    if getattr(inner, "bigint_seal", None) is not None:
        try:
            claims = bigint_air.verify_batch(inner.bigint_seal)
        except Exception as e:
            raise VerificationError(f"bigint accelerator seal: {e}") from e
        # flatten to the segments' 32-bit word stream (a|b|m|r per op,
        # 12 words each at the 384-bit accelerator width)
        big_io = []
        for a, b, m, r in claims:
            for v in (a, b, m, r):
                big_io += [(v >> (32 * w)) & 0xFFFFFFFF for w in range(12)]
    sha_io = None
    if getattr(inner, "sha_seal", None) is not None:
        try:
            claims = sha_air.verify_batch(inner.sha_seal)
        except Exception as e:
            raise VerificationError(f"sha accelerator seal: {e}") from e
        sha_io = []
        for st, blk, outw in claims:
            sha_io += list(st) + list(blk) + list(outw)
    return acc_words, big_io, sha_io


def _check_accelerator_io(out, acc_words, big_io, sha_io=None):
    """The segments' bound IO streams must be prefixes of the proof-bound
    accelerator batches (batches may carry padding extras)."""
    if acc_words is not None:
        seg_words = out["keccak_words"]
        if acc_words[:len(seg_words)] != seg_words:
            raise VerificationError(
                "keccak accelerator IO does not match the segments' "
                "bound IO stream")
    if big_io is not None:
        seg_words = out["bigint_words"]
        if big_io[:len(seg_words)] != seg_words:
            raise VerificationError(
                "bigint accelerator IO does not match the segments' "
                "bound IO stream")
    if sha_io is not None:
        seg_words = out["sha_words"]
        if sha_io[:len(seg_words)] != seg_words:
            raise VerificationError(
                "sha accelerator IO does not match the segments' "
                "bound IO stream")


class DevModeProver:
    """Executes the guest natively; returns a fake receipt (dev-mode seam —
    the reference's fake-backend test strategy, SURVEY.md §4)."""

    name = "dev-mode"

    def prove(self, env: ExecutorEnv, elf: bytes) -> ProveInfo:
        ex = Executor(elf, env.input_bytes, segment_po2=env.segment_limit_po2)
        res = ex.run()
        claim = ReceiptClaim(
            image_id=compute_image_id(elf),
            journal_digest=hashlib.sha256(res.journal).digest(),
            exit_code=res.exit_code)
        receipt = Receipt(journal=res.journal, claim=claim, inner=FakeInner())
        stats = SessionStats(
            user_cycles=res.user_cycles, paging_cycles=res.paging_cycles,
            total_cycles=res.total_cycles, keccak_calls=res.keccak_calls,
            segments=len(res.segments))
        return ProveInfo(receipt=receipt, stats=stats)


class LocalProver:
    """Executes, then STARK-proves every segment on the device.

    With ZETH_SUCCINCT=1, additionally lifts every segment seal into the
    recursion circuit and joins them to ONE root proof (succinct
    receipt); otherwise the receipt carries the per-segment seals."""

    name = "local"

    def prove(self, env: ExecutorEnv, elf: bytes) -> ProveInfo:
        from .circuits import rv32im as rv
        from .executor import load_image
        entry_pc, img_a, img_w = load_image(elf)
        ex = Executor(elf, env.input_bytes,
                      segment_po2=env.segment_limit_po2, trace=True)
        res = ex.run()
        claim = ReceiptClaim(
            image_id=compute_image_id(elf),
            journal_digest=hashlib.sha256(res.journal).digest(),
            exit_code=res.exit_code)
        seals, paging_seals = rv.prove_segments(res.segments, img_a, img_w)
        keccak_seal = None
        if getattr(ex, "keccak_inputs", None) is not None \
                and len(ex.keccak_inputs):
            from .circuits import keccak as keccak_air
            keccak_seal, _ = keccak_air.prove_batch(ex.keccak_inputs)
        bigint_seal = None
        if getattr(ex, "bigint_inputs", None) is not None \
                and len(ex.bigint_inputs):
            from .circuits import bigint2 as bigint_air
            ops = []
            for row in np.asarray(ex.bigint_inputs, np.uint64):
                a, b, m = (sum(int(row[12 * j + w]) << (32 * w)
                               for w in range(12)) for j in range(3))
                ops.append((a, b, m))
            bigint_seal, _ = bigint_air.prove_batch(ops)
        sha_seal = None
        if getattr(ex, "sha_inputs", None) is not None \
                and len(ex.sha_inputs):
            from .circuits import sha256 as sha_air
            rows = np.asarray(ex.sha_inputs, np.uint64)
            sha_seal, _ = sha_air.prove_batch(rows[:, :8], rows[:, 8:24])
        if os.environ.get("ZETH_SUCCINCT", "0") == "1":
            from .circuits import bigint2 as bigint_air_mod
            from .circuits import keccak as keccak_air_mod
            from .circuits import sha256 as sha_air_mod
            from .circuits.paging import PagingAir
            from .circuits.rv32im import Rv32imAir
            from .recursion import succinct
            from .zkp import proof as proof_mod
            air = Rv32imAir(img_a, img_w)
            pg_air = PagingAir()
            proofs = [proof_mod.decode(s) for s in seals]
            pg_proofs = [proof_mod.decode(s) for s in paging_seals]
            extras = []
            for pg in pg_proofs:
                ppg = PagingAir.parse_publics([int(p) for p in pg.publics])
                extras.append((np.asarray(pg.roots["main"], np.uint64),
                               ppg["d0"], ppg["d1"], ppg["g4"],
                               ppg["g5"]))
            # in-circuit resolve: lift the accelerator batch proofs into
            # the fold (their publics get claim-pinned; seals dropped)
            accel, accel_publics = [], []
            for kind, seal_a, a_air in (
                    ("keccak", keccak_seal, keccak_air_mod.KeccakAir()),
                    ("bigint", bigint_seal, bigint_air_mod.Bigint2Air()),
                    ("sha", sha_seal, sha_air_mod.Sha256Air())):
                if seal_a is None:
                    continue
                pf = proof_mod.decode(seal_a)
                accel.append((a_air, pf))
                accel_publics.append((kind, pf.po2,
                                      [int(p) for p in pf.publics]))
            root = succinct.aggregate_segments(air, proofs, pg_air,
                                               pg_proofs, extras,
                                               accel=accel)
            inner = SuccinctInner(
                root_seal=proof_mod.encode(root.proof),
                segment_publics=[[int(p) for p in pf.publics]
                                 for pf in proofs],
                segment_po2s=[pf.po2 for pf in proofs],
                segment_extras=extras,
                paging_po2s=[pf.po2 for pf in pg_proofs],
                paging_publics=[[int(p) for p in pf.publics]
                                for pf in pg_proofs],
                image_addrs=img_a, image_words=img_w, entry_pc=entry_pc,
                accel_publics=accel_publics)
        else:
            inner = SegmentsInner(seals=seals, paging_seals=paging_seals,
                                  image_addrs=img_a,
                                  image_words=img_w, entry_pc=entry_pc,
                                  keccak_seal=keccak_seal,
                                  bigint_seal=bigint_seal,
                                  sha_seal=sha_seal)
        receipt = Receipt(journal=res.journal, claim=claim, inner=inner)
        stats = SessionStats(
            user_cycles=res.user_cycles, paging_cycles=res.paging_cycles,
            total_cycles=res.total_cycles, keccak_calls=res.keccak_calls,
            segments=len(res.segments))
        return ProveInfo(receipt=receipt, stats=stats)


def default_prover():
    """Dispatch on environment (the reference's default_prover() seam)."""
    if dev_mode_enabled():
        return DevModeProver()
    return LocalProver()
