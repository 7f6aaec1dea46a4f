"""Groth16 verifier over BN254 (verify-only port of risc0-groth16).

The reference shrink-wraps a succinct STARK receipt into a constant-size
BN254 Groth16 proof for cheap on-chain verification (SURVEY.md §2.2,
risc0-groth16 3.0.2 / arkworks). Proving a Groth16 wrap is out of TPU
scope per the survey; this module implements the verification equation

    e(A, B) = e(alpha, beta) * e(sum_i pub_i * IC_i, gamma) * e(C, delta)

so receipts wrapped by an external prover can be checked natively. The
receipt-side integration (claim digest -> public inputs) lands with the
recursion circuit that produces the succinct receipt to wrap.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..app import bn254 as B


def _g1_add(p1, p2):
    P = B.P
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    if p1[0] == p2[0]:
        if (p1[1] + p2[1]) % P == 0:
            return None
        s = 3 * p1[0] * p1[0] * pow(2 * p1[1], P - 2, P) % P
    else:
        s = (p2[1] - p1[1]) * pow(p2[0] - p1[0], P - 2, P) % P
    x3 = (s * s - p1[0] - p2[0]) % P
    return (x3, (s * (p1[0] - x3) - p1[1]) % P)


def g1_mul(pt, k):
    r = None
    k %= B.R
    while k:
        if k & 1:
            r = _g1_add(r, pt)
        pt = _g1_add(pt, pt)
        k >>= 1
    return r


def g1_neg(pt):
    if pt is None:
        return None
    return (pt[0], (-pt[1]) % B.P)


@dataclass
class VerifyingKey:
    alpha_g1: tuple            # G1
    beta_g2: tuple             # G2
    gamma_g2: tuple
    delta_g2: tuple
    ic: list                   # G1 points, len = n_publics + 1


@dataclass
class Proof:
    a: tuple                   # G1
    b: tuple                   # G2
    c: tuple                   # G1


class Groth16Error(Exception):
    pass


def verify(vk: VerifyingKey, proof: Proof, publics: list[int]) -> None:
    """Raise Groth16Error unless the proof verifies."""
    if len(publics) + 1 != len(vk.ic):
        raise Groth16Error("public input count mismatch")
    for pt in (proof.a, proof.c, vk.alpha_g1, *vk.ic):
        if not B.g1_valid(pt):
            raise Groth16Error("invalid G1 point")
    for pt in (proof.b, vk.beta_g2, vk.gamma_g2, vk.delta_g2):
        if not B.g2_valid(pt) or (pt is not None
                                  and not B.g2_in_subgroup(pt)):
            raise Groth16Error("invalid G2 point")
    acc = vk.ic[0]
    for coeff, base in zip(publics, vk.ic[1:]):
        acc = _g1_add(acc, g1_mul(base, int(coeff)))
    # e(-A, B) * e(alpha, beta) * e(acc, gamma) * e(C, delta) == 1
    ok = B.pairing_check([
        (g1_neg(proof.a), proof.b),
        (vk.alpha_g1, vk.beta_g2),
        (acc, vk.gamma_g2),
        (proof.c, vk.delta_g2),
    ])
    if not ok:
        raise Groth16Error("pairing equation does not hold")
