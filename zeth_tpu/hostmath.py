"""Host-side Baby Bear arithmetic (numpy uint64, standard form).

The STARK *verifier* and the Fiat-Shamir transcript run on the host where
64-bit integers exist; this module is the ground-truth implementation that
the device kernels in ``zeth_tpu.field`` are tested against, and the math
library the host verifier (``zeth_tpu.zkp.verifier``) is built on.

Mirrors the split in the reference: prover math on the accelerator HAL,
verifier math in portable host code (SURVEY.md §2.2, risc0-zkp 3.0.2).
"""

from __future__ import annotations

import numpy as np

from .field import BETA, P, ROU_FWD, ROU_REV, TWO_ADICITY

_U64 = np.uint64
PU = _U64(P)


def arr(x) -> np.ndarray:
    return np.asarray(x, dtype=_U64)


def fadd(a, b):
    return (arr(a) + arr(b)) % PU


def fsub(a, b):
    return (arr(a) + PU - arr(b) % PU) % PU


def fmul(a, b):
    return (arr(a) * arr(b)) % PU


def fneg(a):
    return (PU - arr(a) % PU) % PU


def fpow(a, e: int):
    a = arr(a)
    result = np.ones_like(a)
    e = int(e)
    while e:
        if e & 1:
            result = fmul(result, a)
        a = fmul(a, a)
        e >>= 1
    return result


def finv(a):
    return fpow(a, P - 2)


def fbatch_inv(a):
    """Montgomery batch inversion over the last axis (flat)."""
    a = arr(a)
    flat = a.reshape(-1)
    n = flat.shape[0]
    prefix = np.ones(n + 1, dtype=_U64)
    for i in range(n):
        prefix[i + 1] = (prefix[i] * flat[i]) % PU
    inv_all = int(finv(prefix[n]))
    out = np.zeros(n, dtype=_U64)
    acc = inv_all
    for i in range(n - 1, -1, -1):
        out[i] = (int(prefix[i]) * acc) % P
        acc = (acc * int(flat[i])) % P
    return out.reshape(a.shape)


# ---------------------------------------------------------------------------
# Degree-4 extension: shape (..., 4), x^4 = BETA
# ---------------------------------------------------------------------------

BETA_U = _U64(BETA)


def ext(x) -> np.ndarray:
    """Coerce int / base array / 4-list into an extension element (..., 4)."""
    a = np.asarray(x, dtype=_U64)
    if a.shape == () or a.shape[-1] != 4:
        base = a
        out = np.zeros(base.shape + (4,), dtype=_U64)
        out[..., 0] = base % PU
        return out
    return a % PU


def ext_add(a, b):
    return fadd(ext(a), ext(b))


def ext_sub(a, b):
    return fsub(ext(a), ext(b))


def ext_mul(a, b):
    a = ext(a)
    b = ext(b)
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = fmul
    c0 = fadd(m(a0, b0), fmul(BETA_U, fadd(fadd(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = fadd(fadd(m(a0, b1), m(a1, b0)), fmul(BETA_U, fadd(m(a2, b3), m(a3, b2))))
    c2 = fadd(fadd(m(a0, b2), m(a1, b1)), fadd(m(a2, b0), fmul(BETA_U, m(a3, b3))))
    c3 = fadd(fadd(m(a0, b3), m(a1, b2)), fadd(m(a2, b1), m(a3, b0)))
    return np.stack([c0, c1, c2, c3], axis=-1)


def ext_neg(a):
    return fneg(ext(a))


def ext_inv(a):
    a = ext(a)
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0 = fadd(fmul(a0, a0), fmul(BETA_U, fsub(fmul(a2, a2), fmul(fadd(a1, a1), a3))))
    b2 = fsub(fmul(fadd(a0, a0), a2), fadd(fmul(a1, a1), fmul(BETA_U, fmul(a3, a3))))
    dinv = finv(fsub(fmul(b0, b0), fmul(BETA_U, fmul(b2, b2))))
    n0 = fsub(fmul(a0, b0), fmul(BETA_U, fmul(a2, b2)))
    n1 = fsub(fmul(BETA_U, fmul(a3, b2)), fmul(a1, b0))
    n2 = fsub(fmul(a2, b0), fmul(a0, b2))
    n3 = fsub(fmul(a1, b2), fmul(a3, b0))
    return np.stack([n0, n1, n2, n3], axis=-1) * dinv[..., None] % PU


def ext_pow(a, e: int):
    a = ext(a)
    result = ext(np.ones(a.shape[:-1], dtype=_U64))
    e = int(e)
    while e:
        if e & 1:
            result = ext_mul(result, a)
        a = ext_mul(a, a)
        e >>= 1
    return result


def ext_is_zero(a) -> bool:
    return bool(np.all(ext(a) % PU == 0))


# ---------------------------------------------------------------------------
# Roots of unity / domains (standard form)
# ---------------------------------------------------------------------------


def rou_fwd(n: int) -> int:
    k = n.bit_length() - 1
    assert 1 << k == n and k <= TWO_ADICITY
    return ROU_FWD[k]


def rou_rev(n: int) -> int:
    k = n.bit_length() - 1
    assert 1 << k == n and k <= TWO_ADICITY
    return ROU_REV[k]


def powers(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] mod p (vectorized log-doubling:
    python per-element loops cost ~0.5 s/M on the prove path)."""
    out = np.ones(n, dtype=_U64)
    k, cur = 1, base % P
    while k < n:
        m = min(k, n - k)
        out[k:k + m] = out[:m] * _U64(cur) % PU
        cur = cur * cur % P
        k *= 2
    return out


def ext_powers(base, n: int) -> np.ndarray:
    """Powers of an extension element: (n, 4)."""
    base = ext(base)
    out = np.empty((n, 4), dtype=_U64)
    acc = ext(1)
    for i in range(n):
        out[i] = acc
        acc = ext_mul(acc, base)
    return out


# -- host NTT (standard form) -------------------------------------------------
# Mirrors zeth_tpu.ntt's natural-order DIT stages in portable numpy so
# the verifier can recompute deterministic commitments (the control-group
# root) without a device.


def _bitrev(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _ntt_np_core(x: np.ndarray, inverse: bool) -> np.ndarray:
    n = x.shape[0]
    x = (np.asarray(x, _U64) % PU)[_bitrev(n)]
    for s in range(1, n.bit_length()):
        m = 1 << s
        half = m // 2
        w = rou_rev(m) if inverse else rou_fwd(m)
        tw = powers(w, half)
        xr = x.reshape((n // m, m) + x.shape[1:])
        shape = (1, half) + (1,) * (x.ndim - 1)
        odd = xr[:, half:] * tw.reshape(shape) % PU
        even = xr[:, :half]
        x = np.concatenate([(even + odd) % PU, (even + PU - odd) % PU],
                           axis=1).reshape((n,) + x.shape[1:])
    return x


def ntt_np(x: np.ndarray) -> np.ndarray:
    """Coefficients -> evaluations on the size-n subgroup (natural order)."""
    return _ntt_np_core(x, inverse=False)


def intt_np(x: np.ndarray) -> np.ndarray:
    """Evaluations -> coefficients."""
    n = x.shape[0]
    out = _ntt_np_core(x, inverse=True)
    return out * np.uint64(pow(n, P - 2, P)) % PU
