"""Batched NTT / iNTT / coset LDE over Baby Bear (device, Montgomery form).

TPU-native design
-----------------
Replaces risc0-zkp's CPU/Metal radix-2 NTT and polynomial LDE
(SURVEY.md §2.2, risc0-zkp 3.0.2). Arrays are laid out ``(n, batch)``:
the transform runs over axis 0 (rows of the execution trace) while
witness columns ride the 128-wide lane axis, so every butterfly stage is
a pure elementwise mul/add over the full array — XLA keeps the batch
vectorized on the VPU and fuses the stage chain.

The iterative Cooley-Tukey stages use reshape-based pairing (no strided
gathers inside stages); the only gather is one bit-reversal permutation.
Twiddle tables are precomputed per size in Montgomery form and embedded
as jit constants.

The low-degree extension evaluates on a *coset* ``shift * <w_N>`` (shift
= the multiplicative generator 31), so the vanishing polynomial of the
trace domain is nonzero everywhere on the evaluation domain — the
constraint quotient is a pointwise multiply by a closed-form Z^-1.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import field as F
from .field import GENERATOR, P

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def bitrev_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation for size n = 2^k (numpy, host)."""
    k = n.bit_length() - 1
    assert 1 << k == n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Montgomery twiddle table w_m^j (j < m/2) for each DIT stage m=2,4,..,n."""
    from . import hostmath as H
    out = []
    for s in range(1, n.bit_length()):
        m = 1 << s
        w = F.rou_rev(m) if inverse else F.rou_fwd(m)
        tw = H.powers(w, m // 2)
        out.append(((tw << np.uint64(32)) % np.uint64(P)).astype(np.uint32))
    return tuple(out)


def _ntt_core(x, inverse: bool):
    """DIT NTT over axis 0. Input natural order, output natural order.

    Consecutive radix-2 stages are fused pairwise into radix-4 steps:
    each step is one read-modify-write pass over the array instead of
    two, halving HBM traffic — the transform is bandwidth-bound at trace
    scale (same butterfly math bit-for-bit, same bit-reversal order).
    """
    n = x.shape[0]
    k = n.bit_length() - 1
    batch_shape = x.shape[1:]
    bshape1 = (1,) * len(batch_shape)
    x = jnp.take(x, jnp.asarray(bitrev_perm(n)), axis=0)
    tws = _stage_twiddles(n, inverse)
    s = 1
    while s + 1 <= k:
        # fused stages m = 2^s and 2m: blocks of 4*h rows, h = m/2
        m = 1 << s
        h = m // 2
        twm = jnp.asarray(tws[s - 1]).reshape((1, 1, h) + bshape1)
        tw2 = jnp.asarray(tws[s])
        tw2lo = tw2[:h].reshape((1, 1, h) + bshape1)
        tw2hi = tw2[h:].reshape((1, 1, h) + bshape1)
        q = x.reshape((n // (2 * m), 4, h) + batch_shape)
        b1 = F.mul(q[:, 1:2], twm)
        b3 = F.mul(q[:, 3:4], twm)
        a0 = F.add(q[:, 0:1], b1)
        a1 = F.sub(q[:, 0:1], b1)
        a2 = F.add(q[:, 2:3], b3)
        a3 = F.sub(q[:, 2:3], b3)
        c2 = F.mul(a2, tw2lo)
        c3 = F.mul(a3, tw2hi)
        x = jnp.concatenate(
            [F.add(a0, c2), F.add(a1, c3), F.sub(a0, c2), F.sub(a1, c3)],
            axis=1)
        x = x.reshape((n,) + batch_shape)
        s += 2
    if s <= k:                       # odd log2: one final radix-2 stage
        m = 1 << s
        half = m // 2
        tw = jnp.asarray(tws[s - 1]).reshape((1, half) + bshape1)
        xr = x.reshape((n // m, m) + batch_shape)
        even = xr[:, :half]
        odd = F.mul(xr[:, half:], tw)
        x = jnp.concatenate([F.add(even, odd), F.sub(even, odd)], axis=1)
        x = x.reshape((n,) + batch_shape)
    return x


def ntt(x):
    """Coefficients -> evaluations on the size-n subgroup (natural order)."""
    return _ntt_core(x, inverse=False)


def intt(x):
    """Evaluations on the size-n subgroup -> coefficients."""
    n = x.shape[0]
    out = _ntt_core(x, inverse=True)
    n_inv_monty = (pow(n, P - 2, P) << 32) % P
    return F.mul(out, jnp.full((), n_inv_monty, _U32))


@functools.lru_cache(maxsize=None)
def _power_table(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] mod p, in Montgomery form (numpy uint32)."""
    from . import hostmath as H
    out = H.powers(base, n)
    return ((out << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def coset_lde(values, blowup: int = 4, shift: int = GENERATOR):
    """Low-degree extend trace evaluations onto the shifted blowup domain.

    values: (n, ...) evaluations on the size-n subgroup (Montgomery).
    Returns (blowup*n, ...) evaluations of the same polynomial on
    ``shift * <w_{blowup*n}>`` (natural order, Montgomery).
    """
    n = values.shape[0]
    coeffs = intt(values)
    shift_pows = jnp.asarray(_power_table(shift, n)).reshape(
        (n,) + (1,) * (values.ndim - 1))
    coeffs = F.mul(coeffs, shift_pows)
    pad = jnp.zeros((n * (blowup - 1),) + values.shape[1:], _U32)
    return ntt(jnp.concatenate([coeffs, pad], axis=0))


def coset_points(n: int, shift: int = GENERATOR) -> np.ndarray:
    """Host-side: the evaluation points shift * w_n^i (standard form)."""
    from . import hostmath as H
    return H.powers(F.rou_fwd(n), n) * np.uint64(shift % P) % np.uint64(P)


def modsum(x, axis: int = 0):
    """Modular sum reduction along an axis via pairwise tree adds.

    uint32 sums of two elements < p never overflow, so each level is a
    single elementwise add+conditional-subtract.
    """
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo = x[:half]
        hi = x[half:2 * half]
        rest = x[2 * half:]
        x = jnp.concatenate([F.add(lo, hi), rest], axis=0)
        n = x.shape[0]
    return x[0]


def eval_poly_ext(coeffs, z_powers):
    """Evaluate base-field polynomial at an extension point.

    coeffs: (n, ...) Montgomery base-field coefficients.
    z_powers: (n, 4) Montgomery powers of the extension point z.
    Returns (..., 4).
    """
    zp = z_powers.reshape(z_powers.shape[:1] + (1,) * (coeffs.ndim - 1) + (4,))
    terms = F.mul(coeffs[..., None], zp)  # (n, ..., 4)
    return modsum(terms, axis=0)


ntt_jit = jax.jit(ntt)
intt_jit = jax.jit(intt)
coset_lde_jit = jax.jit(coset_lde, static_argnames=("blowup", "shift"))
