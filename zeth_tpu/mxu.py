"""Exact Baby Bear matrix multiply on the MXU (int8 limb decomposition).

TPU-native design
-----------------
The systolic array is where this chip's arithmetic lives (v5e: ~394
int8 Tops vs ~5 u32 Tops on the VPU), but it multiplies int8/bf16, not
field elements. This module makes the MXU do *exact* mod-p linear
algebra:

  - every u32 value < 2^31 is decomposed into 4 signed base-256 digits
    d_i in [-128, 127] (int8), value = sum d_i 256^i;
  - a (m, k) x (k, n) field matmul becomes 16 int8 matmuls with int32
    accumulation — exact as long as k <= 2^17 (|d_i d_j| <= 2^14, so
    |sum| <= 2^14 * k < 2^31); larger k is chunked and the per-chunk
    residues are added mod p;
  - the 7 digit-weighted partial sums recombine mod p on the VPU
    (shift-reduce, no division).

Montgomery bookkeeping: with A in Montgomery form (aR) and B in
standard form (b), the integer dot recombines to R * sum(ab) mod p —
i.e. the *Montgomery form of the standard dot product*, with no fixup
multiply. All entry points below use that convention.

Used for the DEEP combination, tap evaluation, and constraint alpha-mix
reductions (weighted column/row sums over LDE-sized matrices), where the
VPU Montgomery path was compute-bound.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import field as F
from .field import P

_U32 = jnp.uint32
# |d_i d_j| <= 2^14, so a length-k int32 dot is bounded by k * 2^14;
# k <= 2^16 keeps the worst case at 2^30 < int32 overflow (2^17 would
# allow exactly 2^31 for adversarial all-(-128) digit columns)
_MAX_K = 1 << 16
R_MOD_P = (1 << 32) % P   # 2^32 mod p


def _digits_i8(x):
    """u32 array (< 2^31) -> list of 4 int8 arrays (signed base-256)."""
    out = []
    cur = x.astype(jnp.int32)
    for i in range(4):
        if i < 3:
            d = cur & jnp.int32(0xFF)
            borrow = (d > 127).astype(jnp.int32)
            d = d - (borrow << 8)
            cur = (cur >> 8) + borrow
        else:
            d = cur          # < 128 for inputs < 2^31 - 2^24
        out.append(d.astype(jnp.int8))
    return out


def _reduce_i32(s):
    """Signed int32 array -> mod-p residue in [0, p) (u32), no division."""
    neg = s < 0
    t = s.astype(jnp.uint32)                     # == s mod 2^32
    t = jnp.where(t >= P, t - jnp.uint32(P), t)
    t = jnp.where(t >= P, t - jnp.uint32(P), t)
    # s = t - 2^32*[s<0]  ->  subtract R = 2^32 mod p when negative
    return F.sub(t, jnp.where(neg, jnp.uint32(R_MOD_P), jnp.uint32(0)))


# Montgomery constants (256^s << 32) % p: montmul by these gives the
# plain product r * 256^s mod p.
_POW256_M = tuple(((pow(256, s, P) << 32) % P) for s in range(7))


def _recombine(partials):
    """partials[s] (int32) for s = 0..6 -> sum_s partials[s]*256^s mod p."""
    acc = _reduce_i32(partials[0])
    for s in range(1, 7):
        r = _reduce_i32(partials[s])
        acc = F.add(acc, F.mul(r, jnp.uint32(_POW256_M[s])))
    return acc


def _mm_i8(a8, b8, ca: int, cb: int):
    return jax.lax.dot_general(
        a8, b8, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.int32)


def _modmm_block(a_u32, b_u32, ca: int, cb: int, m: int, n: int):
    """Integer-exact field matmul over one k-block (k <= _MAX_K).

    Returns sum_k a*b mod p as u32 in [0, p). If exactly one operand is
    Montgomery-form, the result is the Montgomery form of the standard
    dot product (no fixup needed)."""
    da = _digits_i8(a_u32)
    db = _digits_i8(b_u32)
    partials = [jnp.zeros((m, n), jnp.int32) for _ in range(7)]
    for i in range(4):
        for j in range(4):
            partials[i + j] = partials[i + j] + _mm_i8(da[i], db[j], ca, cb)
    return _recombine(partials)


# digit transients are 4 int8 copies of each k-block of `a`; bound them
_BLOCK_BYTES = 1 << 28


@functools.partial(jax.jit, static_argnames=("ta",))
def _modmm(a, b, ta: bool):
    """a (m, k) [or (k, m) when ta] x b (k, n) -> (m, n) mod p.

    k is chunked at _MAX_K for int32 exactness; m is chunked so the
    int8 digit transients stay under ~1 GB."""
    if ta:
        k, m = a.shape
    else:
        m, k = a.shape
    n = b.shape[1]
    kc = min(k, _MAX_K)
    mc = m
    if m * kc * 4 > _BLOCK_BYTES:
        mc = max(256, _BLOCK_BYTES // (kc * 4))
    rows = []
    for moff in range(0, m, mc):
        me = min(m, moff + mc)
        acc = None
        for off in range(0, k, kc):
            ke = min(k, off + kc)
            ablk = a[off:ke, moff:me] if ta else a[moff:me, off:ke]
            blk = _modmm_block(ablk, b[off:ke], 0 if ta else 1, 0,
                               me - moff, n)
            acc = blk if acc is None else F.add(acc, blk)
        rows.append(acc)
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)


def modmm(a, b):
    """Field matmul (m, k) x (k, n) -> (m, n), exact mod p.

    Typical use: a = Montgomery-form LDE columns, b = standard-form
    weights -> Montgomery-form weighted sums. If BOTH operands are
    Montgomery, montmul the result by standard-form 1 to strip the extra
    R (F.mul(out, jnp.uint32(1)))."""
    return _modmm(a, b, False)


def modmm_tn(a, b):
    """Transposed-contraction field matmul: (k, m)^T x (k, n) -> (m, n).

    Contracts the leading axis of both operands (no transposes are
    materialized — the MXU takes the contraction dims directly)."""
    return _modmm(a, b, True)


# ---------------------------------------------------------------------------
# Four-step NTT on the MXU
# ---------------------------------------------------------------------------
#
# An order-N NTT splits as N = n1*n2 (j = j1*n2 + j2, k = k2*n1 + k1):
#
#   X[k2*n1 + k1] = sum_j2 w_N^(k1 j2) w_n2^(k2 j2)
#                     * ( sum_j1 x[j1*n2 + j2] w_n1^(k1 j1) )
#
# i.e. two batched small-matrix multiplies (W1: n1 x n1, W2: n2 x n2)
# around one elementwise twiddle — O(N*sqrt(N)) field MACs instead of
# O(N log N) butterflies, but every MAC runs on the systolic array at
# int8 rates (~100x the VPU's u32 rate), and the whole transform is 2
# data passes instead of log2(N) reshape/concat stages. Replaces the
# radix-2 path of zeth_tpu.ntt for trace-scale arrays (the radix-2
# stays for small sizes, the GSPMD mesh path, and as the oracle).
#
# Montgomery bookkeeping: the W matrices are STANDARD form, data is
# Montgomery — each matmul returns the Montgomery form of the plain
# transform (see module docstring), so monty-in/monty-out holds with no
# fixup. The inverse transform folds 1/N into W2.

_ONE_DIGITS: dict = {}


def _digits_i8_np(vals: np.ndarray) -> np.ndarray:
    """Host digitization: uint array < 2^31-2^24 -> (4, ...) int8."""
    out = np.zeros((4,) + vals.shape, np.int8)
    cur = vals.astype(np.int64)
    for i in range(3):
        d = cur & 0xFF
        borrow = d > 127
        d = d - (borrow.astype(np.int64) << 8)
        cur = (cur >> 8) + borrow
        out[i] = d.astype(np.int8)
    out[3] = cur.astype(np.int8)
    return out


@functools.lru_cache(maxsize=None)
def _split_n(n: int) -> tuple[int, int]:
    k = n.bit_length() - 1
    n1 = 1 << ((k + 1) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _w_digits(m: int, inverse: bool, scale: int) -> np.ndarray:
    """(4, m, m) int8 digits of W[k, j] = scale * w_m^(+-kj) (std form)."""
    from . import hostmath as H
    w = H.rou_rev(m) if inverse else H.rou_fwd(m)
    rows = [H.powers(pow(int(w), k, P), m) * np.uint64(scale % P) % np.uint64(P)
            for k in range(m)]
    return _digits_i8_np(np.stack(rows, axis=0))


@functools.lru_cache(maxsize=None)
def _twiddles(n: int, inverse: bool) -> np.ndarray:
    """(n1, n2) Montgomery w_N^(+-k1 j2) twiddle table."""
    from . import hostmath as H
    n1, n2 = _split_n(n)
    w = H.rou_rev(n) if inverse else H.rou_fwd(n)
    rows = [H.powers(pow(int(w), k1, P), n2) for k1 in range(n1)]
    t = np.stack(rows, axis=0)
    return ((t << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def _mm_digits(dw, da, dn_a: int):
    """Exact mod-p matmul of a constant digit matrix against digitized
    data: dw (4, m, m) int8, da list of 4 int8 arrays whose axis `dn_a`
    has length m. Returns u32 mod-p array shaped like da with axis dn_a
    replaced by the W row axis (leading)."""
    acc = None
    for s in range(7):
        part = None
        for i in range(max(0, s - 3), min(3, s) + 1):
            j = s - i
            prod = jax.lax.dot_general(
                dw[i], da[j], (((1,), (dn_a,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = prod if part is None else part + prod
        r = _reduce_i32(part)
        if s:
            r = F.mul(r, jnp.uint32(_POW256_M[s]))
        acc = r if acc is None else F.add(acc, r)
    return acc


def _digits_i8_dev(x):
    return _digits_i8(x)


def _ntt_fs_block(x, n: int, inverse: bool, scale_n: bool):
    """Four-step NTT of one column block. x: (n, C) Montgomery ->
    (n, C) Montgomery, natural order in and out (trace-once helper —
    callers wrap in a jit)."""
    n1, n2 = _split_n(n)
    C = x.shape[1]
    a = x.reshape(n1, n2, C)
    da = _digits_i8_dev(a)
    # step 1: contract j1 -> (k1, n2, C)
    b = _mm_digits(jnp.asarray(_w_digits(n1, inverse, 1)), da, 0)
    # step 2: twiddle w_N^(k1 j2)
    b = F.mul(b, jnp.asarray(_twiddles(n, inverse))[:, :, None])
    # step 3: contract j2 -> (k2, k1, C); folding 1/n into W2 makes the
    # inverse transform come out scaled
    db = _digits_i8_dev(b)
    scale = pow(n, P - 2, P) if scale_n else 1
    out = _mm_digits(jnp.asarray(_w_digits(n2, inverse, scale)), db, 1)
    return out.reshape(n, C)


@functools.partial(jax.jit, static_argnames=("n",))
def _intt_fs(x, n: int):
    return _ntt_fs_block(x, n, True, True)


@functools.partial(jax.jit, static_argnames=("n",))
def _ntt_fs(x, n: int):
    return _ntt_fs_block(x, n, False, False)


# column block width: bounds the int8/int32 transients of one dispatch
FS_COL_BLOCK = 128
# minimum rows for the MXU path (below this the radix-2 VPU NTT wins)
FS_MIN_ROWS = 1 << 15
# maximum columns: the per-matmul digit recombine is ~200 VPU ops per
# output element, so for wide groups (the 1001-col rv32im main) the
# radix-2 path's ~420 ops/element over log2(n) HBM passes still wins
# (measured 0.95s vs 1.23s at po2=18); narrow groups amortize the
# recombine over far fewer elements and the MXU wins (0.12s -> 0.05s)
FS_MAX_COLS = 256


def ntt_fs(x_monty, inverse: bool = False):
    """Drop-in (n, C) Montgomery NTT/iNTT via column-blocked four-step
    matmuls. Bit-identical to zeth_tpu.ntt.ntt / .intt."""
    n, C = x_monty.shape
    fn = _intt_fs if inverse else _ntt_fs
    if C <= FS_COL_BLOCK:
        return fn(x_monty, n)
    outs = [fn(x_monty[:, off:off + FS_COL_BLOCK], n)
            for off in range(0, C, FS_COL_BLOCK)]
    return jnp.concatenate(outs, axis=1)


@functools.lru_cache(maxsize=None)
def _coset_scales(n: int, blowup: int, shift: int) -> np.ndarray:
    """(blowup, n) Montgomery tables (shift * w_{blowup*n}^r)^i — the
    per-coset coefficient pre-scales of the interleaved LDE."""
    from . import hostmath as H
    w = H.rou_fwd(blowup * n)
    out = np.stack([H.powers(int(shift) * pow(int(w), r, P) % P, n)
                    for r in range(blowup)], axis=0)
    return ((out << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


@functools.partial(jax.jit, static_argnames=("n", "blowup", "shift"))
def _lde_fs_block(x, n: int, blowup: int, shift: int):
    """Coset LDE of one column block: (n, C) Montgomery evaluations on
    <w_n> -> (blowup*n, C) evaluations on shift*<w_{blowup*n}>, natural
    order. Runs blowup size-n forward transforms (rows 4k+r form coset
    r) — 2x fewer MACs than one size-4n transform of the padded
    coefficients, and the interleave is a reshape."""
    C = x.shape[1]
    coeffs = _ntt_fs_block(x, n, True, True)
    scales = jnp.asarray(_coset_scales(n, blowup, shift))
    outs = [_ntt_fs_block(F.mul(coeffs, scales[r][:, None]), n, False, False)
            for r in range(blowup)]
    return jnp.stack(outs, axis=1).reshape(blowup * n, C)


def coset_lde_fs(values_monty, blowup: int = 4, shift: int = None):
    """MXU coset LDE, column-blocked. Bit-identical to ntt.coset_lde."""
    from .field import GENERATOR
    if shift is None:
        shift = GENERATOR
    n, C = values_monty.shape
    if C <= FS_COL_BLOCK:
        return _lde_fs_block(values_monty, n, blowup, shift)
    outs = [_lde_fs_block(values_monty[:, off:off + FS_COL_BLOCK],
                          n, blowup, shift)
            for off in range(0, C, FS_COL_BLOCK)]
    return jnp.concatenate(outs, axis=1)
