"""AIR (algebraic intermediate representation) interface.

The shape mirrors the reference's circuit structure (SURVEY.md §2.2,
risc0-circuit-rv32im: control/data/accum witness groups) re-cast for a
generic prover:

- ``control``: columns deterministic in (circuit, po2) — committed by the
  prover, root checked by the verifier against a precomputed constant
  (the analog of the reference's code/control commitment).
- ``main``:    witness columns (the reference's "data" group).
- ``aux``:     columns whose witgen consumes Fiat-Shamir challenges drawn
  after the main commit (the reference's "accum" grand-product group).

Constraints are *polymorphic*: the same ``constraints()`` body runs on
device over full LDE columns (Montgomery uint32 base-field arrays) during
proving, and on host over extension-field tap values at the DEEP point z
during verification. Values are combined exclusively through the ``ops``
object; ``v(group, col, offset)`` fetches a column value at the current
row (offset 0) or the next trace row (offset 1).

Max constraint degree is 4 (= the LDE blowup); keep products of committed
values to degree <= 4.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import field as F
from .. import hostmath as H

GROUPS = ("control", "main", "aux")


class DeviceOps:
    """Constraint math over (4n,) Montgomery base-field device arrays."""

    is_device = True

    add = staticmethod(F.add)
    sub = staticmethod(F.sub)
    mul = staticmethod(F.mul)
    neg = staticmethod(F.neg)

    @staticmethod
    def const(c: int):
        return F.to_monty(jnp.asarray(np.uint32(c % F.P)))


class HostExtOps:
    """Constraint math over (4,) standard-form extension values (host)."""

    is_device = False

    add = staticmethod(H.ext_add)
    sub = staticmethod(H.ext_sub)
    mul = staticmethod(H.ext_mul)
    neg = staticmethod(H.ext_neg)

    @staticmethod
    def const(c: int):
        return H.ext(c % F.P)


class HostVecOps:
    """Constraint math over full numpy base-field columns (standard form).

    Used by ``check_constraints`` to evaluate an AIR on the raw trace
    domain without any proving machinery — the witgen debugging oracle.
    """

    is_device = False

    add = staticmethod(H.fadd)
    sub = staticmethod(H.fsub)
    mul = staticmethod(H.fmul)
    neg = staticmethod(H.fneg)

    @staticmethod
    def const(c: int):
        return np.uint64(c % F.P)


def check_constraints(air, control_std, main_std, aux_std, publics,
                      challenges, derived_extra=None) -> dict:
    """Evaluate every constraint on the trace domain (host numpy).

    Returns {constraint_index: count_of_nonzero_rows} for violations only.
    A correct witness returns {}.
    """
    cols = {"control": np.asarray(control_std, np.uint64),
            "main": np.asarray(main_std, np.uint64)}
    cols["aux"] = (np.asarray(aux_std, np.uint64) if aux_std is not None
                   else np.zeros((cols["main"].shape[0], 0), np.uint64))

    def v(group, col, offset=0):
        arr = cols[group][:, col]
        return np.roll(arr, -offset) if offset else arr

    challenges = np.asarray(challenges, np.uint64).reshape(-1, 4)
    if getattr(air, "n_derived", 0):
        derived = np.asarray(
            air.derived_challenges(publics, challenges,
                                   extra=derived_extra),
            np.uint64).reshape(-1, 4)
        challenges = np.concatenate([challenges, derived], axis=0)
    n_ps = getattr(air, "n_public_scalars", None)
    scalar_pubs = publics if n_ps is None else publics[:n_ps]
    pubs = [np.uint64(int(p) % F.P) for p in scalar_pubs]
    chals = [tuple(np.uint64(int(c[j]) % F.P) for j in range(4))
             for c in challenges]
    out = {}
    for i, c in enumerate(air.constraints(v, HostVecOps, pubs, chals)):
        bad = int(np.count_nonzero(np.asarray(c, np.uint64) % H.PU))
        if bad:
            out[i] = bad
    return out


# ---------------------------------------------------------------------------
# Circuit-extension algebra: a degree-4 extension value *inside the
# constraint system*, represented as a 4-tuple of base ops-values.
#
# Fiat-Shamir challenges are full Fp4 elements (a single ~31-bit base
# challenge makes LogUp/permutation arguments grindable — ADVICE.md r1
# finding #1). The AIR receives each challenge as a 4-tuple of its base
# components; these helpers implement Fp4 arithmetic polymorphically over
# any ops backend. Each ext-valued constraint contributes its 4 component
# polynomials as 4 separate (base-valued) constraints.
# ---------------------------------------------------------------------------

from ..field import BETA


def cext(ops, x):
    """Lift a base ops-value (or int via ops.const) to a circuit-ext tuple."""
    if isinstance(x, int):
        x = ops.const(x)
    z = ops.const(0)
    return (x, z, z, z)


def cadd(ops, a, b):
    return tuple(ops.add(x, y) for x, y in zip(a, b))


def csub(ops, a, b):
    return tuple(ops.sub(x, y) for x, y in zip(a, b))


def cmul_base(ops, a, s):
    """Circuit-ext times base ops-value."""
    return tuple(ops.mul(x, s) for x in a)


def cmul(ops, a, b):
    """Schoolbook quartic product with x^4 = BETA reduction."""
    beta = ops.const(BETA)
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    add, mul = ops.add, ops.mul
    c0 = add(mul(a0, b0),
             mul(beta, add(add(mul(a1, b3), mul(a2, b2)), mul(a3, b1))))
    c1 = add(add(mul(a0, b1), mul(a1, b0)),
             mul(beta, add(mul(a2, b3), mul(a3, b2))))
    c2 = add(add(mul(a0, b2), mul(a1, b1)),
             add(mul(a2, b0), mul(beta, mul(a3, b3))))
    c3 = add(add(mul(a0, b3), mul(a1, b2)), add(mul(a2, b1), mul(a3, b0)))
    return (c0, c1, c2, c3)


class Air:
    """Base class. Subclasses set the column counts and the constraints."""

    name = "air"
    control_cols = 0
    main_cols = 0
    aux_cols = 0
    n_challenges = 0        # ext challenges sampled before aux witgen
    n_derived = 0           # derived challenge-like scalars (see below)
    n_public_scalars = None  # publics entering constraints (None = all)
    # optional bool mask (main_cols,): True for columns whose witness
    # values are bits. The prover bit-packs those for the host->device
    # transfer (the witness upload dominates small-segment prove time on
    # tunneled chips); packing is prover-local and soundness-neutral.
    main_bit_mask: np.ndarray | None = None

    def derived_challenges(self, publics, challenges, extra=None):
        """Challenge-dependent scalars both sides compute from the publics
        (e.g. expected LogUp sums over public lists). Appended to the
        sampled challenges as entries [n_challenges:]. (k, 4) standard.

        extra: AIR-specific values that are NOT derivable from this
        proof's publics but are bound by a companion proof (e.g. the
        rv32im RAM boundary sums d0/d1, bound by the paging proof —
        circuits/paging.py). The prover passes them at prove time; the
        verifier passes the companion proof's public values."""
        return np.zeros((0, 4), dtype=np.uint64)

    def control_trace(self, po2: int) -> np.ndarray:
        """Deterministic (n, control_cols) standard-form columns."""
        return np.zeros((1 << po2, self.control_cols), dtype=np.uint64)

    def build_aux(self, main_std: np.ndarray, challenges: np.ndarray):
        """Aux-column witgen: host standard-form (n, main_cols) ->
        standard-form (n, aux_cols) numpy.

        challenges: (n_challenges [+ n_derived], 4) standard-form numpy.
        """
        raise NotImplementedError

    def constraints(self, v, ops, publics: list[int]) -> list:
        """Return constraint values; each must vanish on every trace row."""
        raise NotImplementedError

    # -- helpers -----------------------------------------------------------

    def group_cols(self, group: str) -> int:
        return {"control": self.control_cols, "main": self.main_cols,
                "aux": self.aux_cols}[group]


def is_first_column(po2: int) -> np.ndarray:
    """Standard control column: 1 on row 0, else 0."""
    col = np.zeros(1 << po2, dtype=np.uint64)
    col[0] = 1
    return col


def is_last_column(po2: int) -> np.ndarray:
    """Standard control column: 1 on the last row, else 0."""
    col = np.zeros(1 << po2, dtype=np.uint64)
    col[-1] = 1
    return col
