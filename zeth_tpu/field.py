"""Baby Bear field arithmetic as JAX uint32 ops (Montgomery form).

TPU-native design
-----------------
The reference stack bottoms out in risc0-core's Baby Bear field
``p = 15 * 2^27 + 1 = 2013265921`` and its degree-4 extension
``F_p[x] / (x^4 - 11)`` (SURVEY.md §2.2; pinned dep risc0-core 3.0.0,
/root/reference/Cargo.lock:5338-5346). TPU vector units have no 64-bit
integer multiply, so the 62-bit products needed for modular
multiplication are assembled from 16-bit limb products entirely in
uint32. Every function below is shape-polymorphic, vectorizes over the
VPU's 8x128 lanes, and fuses under XLA/jit — field elements are a dtype
discipline (uint32 arrays), not objects.

Representation: **Montgomery form with R = 2^32** for all device-resident
data. `to_monty` / `from_monty` convert at the host boundary. The degree-4
extension ("Fp4", risc0's FpExt) is a trailing axis of size 4.

All constants below are derived, not copied: R/R2/NPRIME are the unique
Montgomery constants for (p, 2^32); 0x1a427a41 is the canonical order-2^27
root of unity reachable from the smallest generator g = 31.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants (python ints; closed under the derivations in tests/test_field.py)
# ---------------------------------------------------------------------------

P = 2013265921                      # 15 * 2^27 + 1
P_U32 = P
TWO_ADICITY = 27
GENERATOR = 31                      # smallest generator of F_p^*
R = (1 << 32) % P                   # Montgomery R mod p == to_monty(1)
R2 = (R * R) % P                    # to_monty multiplier
NPRIME = ((1 << 32) - pow(P, -1, 1 << 32)) % (1 << 32)  # -p^-1 mod 2^32
ROU_ORDER_27 = pow(GENERATOR, (P - 1) // (1 << 27), P)  # 0x1a427a41

# Forward/reverse roots of unity for every power of two up to 2^27.
ROU_FWD = [1] * (TWO_ADICITY + 1)
ROU_FWD[TWO_ADICITY] = ROU_ORDER_27
for _i in range(TWO_ADICITY - 1, -1, -1):
    ROU_FWD[_i] = (ROU_FWD[_i + 1] * ROU_FWD[_i + 1]) % P
ROU_REV = [pow(r, P - 2, P) for r in ROU_FWD]

BETA = 11                           # extension: x^4 - BETA irreducible
EXT_DEG = 4

_U32 = jnp.uint32
_MASK16 = 0xFFFF


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


# ---------------------------------------------------------------------------
# Core modular arithmetic (uint32 lanes)
# ---------------------------------------------------------------------------


def _mulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays.

    Built from four 16-bit limb products; every intermediate fits uint32.
    """
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    hi = a1 * b1
    # carry column: (lo >> 16) + low halves of the two mids; < 3 * 2^16
    t = (lo >> 16) + (m1 & _MASK16) + (m2 & _MASK16)
    return hi + (m1 >> 16) + (m2 >> 16) + (t >> 16)


def _mulhi_p(m):
    """High 32 bits of m * P, specialised to P = 0x7800_0001 (b0 = 1)."""
    m0 = m & _MASK16
    m1 = m >> 16
    m2_ = m0 * 0x7800
    hi = m1 * 0x7800
    t = m1 + (m2_ & _MASK16)
    return hi + (m2_ >> 16) + (t >> 16)


def mont_redc(hi, lo):
    """Montgomery reduction of a 64-bit value (hi, lo) -> value * R^-1 mod p."""
    m = lo * NPRIME                      # mod 2^32
    carry = (lo != 0).astype(_U32)       # lo + mullo(m, P) is 0 or 2^32
    t = hi + _mulhi_p(m) + carry         # < 2p
    return jnp.where(t >= P, t - P, t)


def mul(a, b):
    """Montgomery product of two field arrays: a * b * R^-1 mod p."""
    a = _u32(a)
    b = _u32(b)
    return mont_redc(_mulhi32(a, b), a * b)


def add(a, b):
    s = _u32(a) + _u32(b)
    return jnp.where(s >= P, s - P, s)


def sub(a, b):
    a = _u32(a)
    b = _u32(b)
    return jnp.where(a >= b, a - b, a + (P - b))


def neg(a):
    a = _u32(a)
    return jnp.where(a == 0, a, P - a)


def to_monty(x):
    """Standard form -> Montgomery form (x * R mod p)."""
    return mul(_u32(x), jnp.full((), R2, _U32))


def from_monty(a):
    """Montgomery form -> standard form (a * R^-1 mod p)."""
    a = _u32(a)
    return mont_redc(jnp.zeros_like(a), a)


def pow_const(a, e: int):
    """a ** e for a static python exponent (square-and-multiply, traced once)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if result is None:
        return jnp.full(jnp.shape(a), mont_one(), _U32)
    return result


def inv(a):
    """Multiplicative inverse via Fermat: a^(p-2). Montgomery in/out."""
    return pow_const(a, P - 2)


def mont_one() -> int:
    """The Montgomery representation of 1 (a python int constant)."""
    return R


# ---------------------------------------------------------------------------
# Degree-4 extension ("Fp4"): trailing axis of size 4, x^4 = BETA
# ---------------------------------------------------------------------------

_BETA_MONTY = (BETA * R) % P


def ext_from_base(a):
    """Embed base-field array (...,) -> extension array (..., 4)."""
    a = _u32(a)
    z = jnp.zeros(a.shape + (3,), _U32)
    return jnp.concatenate([a[..., None], z], axis=-1)


def ext_add(a, b):
    return add(a, b)


def ext_sub(a, b):
    return sub(a, b)


def _mul_beta(a):
    return mul(a, jnp.full((), _BETA_MONTY, _U32))


def ext_mul(a, b):
    """Schoolbook quartic multiply with x^4 = BETA reduction (16 base muls)."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    c0 = add(mul(a0, b0), _mul_beta(add(add(mul(a1, b3), mul(a2, b2)), mul(a3, b1))))
    c1 = add(add(mul(a0, b1), mul(a1, b0)), _mul_beta(add(mul(a2, b3), mul(a3, b2))))
    c2 = add(add(mul(a0, b2), mul(a1, b1)), add(mul(a2, b0), _mul_beta(mul(a3, b3))))
    c3 = add(add(mul(a0, b3), mul(a1, b2)), add(mul(a2, b1), mul(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def ext_mul_base(a, s):
    """Extension (..., 4) times base-field scalar/array (...,)."""
    return mul(a, _u32(s)[..., None])


def ext_inv(a):
    """Quartic inverse via the conjugate/norm trick.

    With abar = a(-x): a * abar = b0 + b2 x^2, and
    (b0 + b2 x^2)(b0 - b2 x^2) = b0^2 - BETA * b2^2 in F_p.
    """
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    # b0 = a0^2 + BETA * (a2^2 - 2 a1 a3)  [coeff of x^0 in a*abar]
    b0 = add(mul(a0, a0), _mul_beta(sub(mul(a2, a2), mul(add(a1, a1), a3))))
    # b2 = 2 a0 a2 - a1^2 - BETA a3^2     [coeff of x^2]
    b2 = sub(mul(add(a0, a0), a2), add(mul(a1, a1), _mul_beta(mul(a3, a3))))
    # denom = b0^2 - BETA b2^2 in F_p
    denom_inv = inv(sub(mul(b0, b0), _mul_beta(mul(b2, b2))))
    # a^-1 = abar * (b0 - b2 x^2) * denom^-1, with abar = (a0, -a1, a2, -a3):
    n0 = sub(mul(a0, b0), _mul_beta(mul(a2, b2)))
    n1 = sub(_mul_beta(mul(a3, b2)), mul(a1, b0))
    n2 = sub(mul(a2, b0), mul(a0, b2))
    n3 = sub(mul(a1, b2), mul(a3, b0))
    out = jnp.stack([n0, n1, n2, n3], axis=-1)
    return ext_mul_base(out, denom_inv)


def ext_pow_const(a, e: int):
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else ext_mul(result, base)
        e >>= 1
        if e:
            base = ext_mul(base, base)
    if result is None:
        one = jnp.zeros(jnp.shape(a), _U32)
        return one.at[..., 0].set(mont_one())
    return result


# ---------------------------------------------------------------------------
# Host-side helpers (python ints / numpy interop)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def rou_fwd(n: int) -> int:
    """Forward 2^k-th root of unity for domain size n = 2^k (standard form)."""
    k = n.bit_length() - 1
    assert 1 << k == n and k <= TWO_ADICITY, f"bad domain size {n}"
    return ROU_FWD[k]


@functools.lru_cache(maxsize=None)
def rou_rev(n: int) -> int:
    k = n.bit_length() - 1
    assert 1 << k == n and k <= TWO_ADICITY, f"bad domain size {n}"
    return ROU_REV[k]
