"""DEEP-ALI STARK prover: all heavy math on device, transcript on host.

Replaces the prover pipeline of risc0-zkp 3.0.2 (SURVEY.md §3.2 PROVE
step: witgen -> trace LDE -> Merkle commit -> DEEP-ALI composition -> FRI).
Protocol spec: PROTOCOL.md. Stage structure:

  commit control/main/aux groups  (coset LDE + batched Poseidon2 Merkle)
  -> constraint quotient Q = mix(C_i)/Z on the LDE domain (one fused jit)
  -> "check" group = Q split into 4 coefficient slices x 4 ext components
  -> DEEP taps at z / z*w_n (power series via associative scan + mod-dot)
  -> DEEP combination polynomial -> FRI (zeth_tpu.zkp.fri)
  -> Merkle openings of every group at the FRI query indices.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .. import field as F
from .. import hostmath as H
from .. import ntt
from ..field import GENERATOR, P
from ..hash import merkle
from . import fri, tape
from .air import Air
from .transcript import Transcript

BLOWUP = fri.BLOWUP
_U32 = jnp.uint32

# Tap stream order (PROTOCOL.md step 5): offset 0 = z, offset 1 = z*w_n.
TAP_STREAMS = [("control", 0), ("main", 0), ("aux", 0), ("check", 0),
               ("control", 1), ("main", 1), ("aux", 1)]


def _to_monty_np(a) -> np.ndarray:
    return ((np.asarray(a, np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def _from_monty(a) -> np.ndarray:
    return np.asarray(F.from_monty(a)).astype(np.uint64)


@dataclass
class GroupOpening:
    rows: np.ndarray     # (n_queries, cols) standard form LDE rows
    paths: list          # n_queries sibling paths (depth, 8)


@dataclass
class StarkProof:
    air_name: str
    po2: int
    publics: list
    roots: dict          # group -> (8,) digest
    taps: np.ndarray     # (n_taps, 4) standard form, TAP_STREAMS order
    fri_proof: fri.FriProof
    openings: dict       # group -> GroupOpening
    query_indices: list


@functools.partial(jax.jit, static_argnames=("n",))
def ext_power_series(z_monty, n: int):
    """Device (n, 4) Montgomery array of z^0 .. z^(n-1) (log-depth scan)."""
    zz = jnp.broadcast_to(z_monty, (n, 4))
    ps = jax.lax.associative_scan(F.ext_mul, zz)
    one = jnp.zeros((1, 4), _U32).at[0, 0].set(F.mont_one())
    return jnp.concatenate([one, ps[:-1]], axis=0)


@jax.jit
def _tap_eval(coeffs, z_pows):
    """All columns of a group evaluated at one ext point: (n,c),(n,4)->(c,4)."""
    return ntt.eval_poly_ext(coeffs, z_pows)


@functools.partial(jax.jit, static_argnames=("n",))
def base_power_series(b_monty, n: int):
    """Device (n,) Montgomery array of b^0 .. b^(n-1)."""
    bb = jnp.broadcast_to(b_monty, (n,))
    ps = jax.lax.associative_scan(F.mul, bb)
    one = jnp.full((1,), F.mont_one(), _U32)
    return jnp.concatenate([one, ps[:-1]], axis=0)


@jax.jit
def _lde_group(trace_monty):
    """(n, c) trace -> (coeffs (n, c), lde (4n, c)) on the coset 31*<w_4n>."""
    n, c = trace_monty.shape
    coeffs = ntt.intt(trace_monty)
    shift_pows = base_power_series(jnp.asarray(np.uint32((GENERATOR << 32) % P)), n)
    scaled = F.mul(coeffs, shift_pows[:, None])
    pad = jnp.zeros((n * (BLOWUP - 1), c), _U32)
    lde = ntt.ntt(jnp.concatenate([scaled, pad], axis=0))
    return coeffs, lde


@jax.jit
def _lde_group_std(trace_std_u32):
    """Same as _lde_group but takes standard-form uint32 and converts on
    device (uint64 modular reduction is slow in host numpy)."""
    return _lde_group(F.to_monty(trace_std_u32))


@jax.jit
def _lde_only(trace_monty):
    """LDE without keeping the coefficient array (it doubles HBM at
    po2>=18; DEEP taps are evaluated barycentrically from the LDE)."""
    return _lde_group(trace_monty)[1]


@jax.jit
def _lde_only_std(trace_std_u32):
    return _lde_group(F.to_monty(trace_std_u32))[1]


# Above ~0.8e9 LDE elements (the po2=18 rv32im main group and up) the
# one-shot LDE program's transients (bit-reversal gather + the fused
# radix-4 stage intermediates + zero-pad concatenate) no longer fit
# beside the resident groups in 16 GB HBM; chunk the trace column-wise
# and write each chunk's LDE into a donated output buffer.
_LDE_CHUNK_THRESHOLD = 800_000_000
_LDE_CHUNK_ELEMS = 300_000_000


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("std",))
def _lde_fill(out, chunk, off, std: bool):
    m = F.to_monty(chunk) if std else chunk
    lde = _lde_group(m)[1]
    return jax.lax.dynamic_update_slice(out, lde, (jnp.int32(0), off))


def _lde_chunked(dev, std: bool):
    n, c = dev.shape
    total = BLOWUP * n * c
    if total <= _LDE_CHUNK_THRESHOLD:
        return _lde_only_std(dev) if std else _lde_only(dev)
    k = -(-total // _LDE_CHUNK_ELEMS)
    w = -(-c // k)
    out = jnp.zeros((BLOWUP * n, c), _U32)
    for off in range(0, c, w):
        cw = min(w, c - off)
        chunk = jax.lax.slice_in_dim(dev, off, off + cw, axis=1)
        out = _lde_fill(out, chunk, jnp.int32(off), std)
    return out


def _lde_chunked_std(dev):
    return _lde_chunked(dev, True)


def _lde_chunked_monty(dev):
    return _lde_chunked(dev, False)


_to_monty_dev = jax.jit(F.to_monty)


# -- streamed main group (po2 >= 20) ----------------------------------------
#
# At po2=20 x rv32im width the blowup-4 main LDE is ~17 GB — it cannot
# be resident on a 16 GB chip at all. Instead the g-shifted COEFFICIENT
# matrix (n x c, 1/4 the LDE) stays resident and single-coset
# evaluations are recomputed on demand: the LDE domain g*<w_4n> is the
# union of 4 cosets (g*w_4n^r)*<w_n>, and natural-order LDE row 4k+r is
# coset r at position k. Merkle leaves hash per coset and interleave;
# the check polynomial evaluates coset by coset (tape stride=1); taps
# and the DEEP mix only ever read the stride-4 subdomain = coset 0; the
# ~50 query-opening rows evaluate straight from the coefficients on the
# MXU. Seals stay bit-identical to the resident-LDE path.

_STREAM_MAIN_BYTES = 12 << 30


@functools.partial(jax.jit, donate_argnums=(0,))
def _coeffs_fill(out, chunk_std, off, shift_pows):
    cf = ntt.intt(F.to_monty(chunk_std))
    cf = F.mul(cf, shift_pows[:, None])
    return jax.lax.dynamic_update_slice(out, cf, (jnp.int32(0), off))


def _shifted_coeffs(dev_std):
    """(n, c) std trace evals -> (n, c) Montgomery coefficients of
    f(g*x) (column-chunked; bounded transients)."""
    n, c = dev_std.shape
    sp = base_power_series(
        jnp.asarray(np.uint32((GENERATOR << 32) % P)), n)
    w = max(1, _LDE_CHUNK_ELEMS // n)
    out = jnp.zeros((n, c), _U32)
    for off in range(0, c, w):
        cw = min(w, c - off)
        chunk = jax.lax.slice_in_dim(dev_std, off, off + cw, axis=1)
        out = _coeffs_fill(out, chunk, jnp.int32(off), sp)
    return out


@functools.partial(jax.jit, donate_argnums=(0,))
def _coset_fill(out, cf_chunk, off, r_pows):
    ev = ntt.ntt(F.mul(cf_chunk, r_pows[:, None]))
    return jax.lax.dynamic_update_slice(out, ev, (jnp.int32(0), off))


def _coset_eval(coeffs1, r: int, n: int):
    """Evaluations of the main columns on coset r: (n, c) Montgomery
    (= LDE rows 4k+r)."""
    c = coeffs1.shape[1]
    wr = pow(H.rou_fwd(BLOWUP * n), r, P)
    rp = base_power_series(jnp.asarray(np.uint32((wr << 32) % P)), n)
    w = max(1, _LDE_CHUNK_ELEMS // n)
    out = jnp.zeros((n, c), _U32)
    for off in range(0, c, w):
        cw = min(w, c - off)
        chunk = jax.lax.slice_in_dim(coeffs1, off, off + cw, axis=1)
        out = _coset_fill(out, chunk, jnp.int32(off), rp)
    return out


@jax.jit
def _interleave4(parts):
    """4 x (n, k) per-coset arrays -> (4n, k) natural LDE order."""
    return jnp.stack(parts, axis=1).reshape(
        4 * parts[0].shape[0], parts[0].shape[1])


@functools.partial(jax.jit, static_argnames=("r",))
def _coset_rows(lde, r: int):
    """Rows 4k+r of a resident (4n, c) LDE -> (n, c) copy."""
    return lde[r::BLOWUP]


@functools.partial(jax.jit, static_argnames=("n",))
def _eval_rows_at_points(coeffs1, pts_m, n: int):
    """Open main rows at LDE indices directly from the coefficients:
    row value = sum_j coeffs1[j, c] * (w_4n^q)^j (MXU mod-p matmul).
    pts_m: (Q,) Montgomery w_4n^q points. Returns (Q, c) Montgomery."""
    from .. import mxu
    pows_m = jax.vmap(lambda b: base_power_series(b, n))(pts_m)
    pows_std = F.from_monty(pows_m)
    return mxu.modmm(pows_std, coeffs1)


def _lde_dispatch(mesh, n: int):
    """Pick the LDE implementation: the MXU four-step path for
    trace-scale single-chip arrays (O(N*sqrt N) int8 systolic MACs, 2
    data passes), the radix-2 VPU path for small sizes and the GSPMD
    mesh (where the row sharding maps onto the butterfly stages)."""
    from .. import mxu
    if mesh is None and n >= mxu.FS_MIN_ROWS:
        # at po2>=19 the MXU four-step's int8-plane transients don't fit
        # beside the resident main LDE: take the leaner chunked radix-2
        # path for every group
        big = n >= (1 << 19)

        def lde_std(dev):
            if big or dev.shape[1] > mxu.FS_MAX_COLS:
                return _lde_chunked_std(dev)
            return mxu.coset_lde_fs(_to_monty_dev(dev))

        def lde_monty(m):
            if big or m.shape[1] > mxu.FS_MAX_COLS:
                return _lde_chunked_monty(m)
            return mxu.coset_lde_fs(m)

        return lde_std, lde_monty
    return _lde_only_std, _lde_only


@functools.partial(jax.jit, static_argnames=("chunk", "stride"))
def _eval_rows_ext_s4(rows, w, chunk: int, stride: int = 4):
    """Weighted stride-4 row reduction for DEEP taps: row 4k of a
    blowup-4 LDE in natural order is the trace polynomial at g*w_n^k,
    so a degree-<n column is interpolated exactly from every 4th LDE
    row — 4x less compute and HBM traffic than reducing all 4n rows.
    rows: (stride*n, c) Montgomery; w: (n, e) Montgomery ext weights ->
    (c, e). stride=1 when `rows` already carries only the coset-0
    evaluations (the streamed-main path).
    """
    c = rows.shape[1]
    n = w.shape[0]
    e = w.shape[1]

    def body(acc, i):
        rc = jax.lax.dynamic_slice(rows, (i * chunk * stride, 0),
                                   (chunk * stride, c))
        rc = rc[::stride]
        wc = jax.lax.dynamic_slice(w, (i * chunk, 0), (chunk, e))
        t = F.mul(rc[:, :, None], wc[:, None, :])
        return F.add(acc, ntt.modsum(t, axis=0)), None

    acc0 = jnp.zeros((c, e), _U32)
    acc, _ = jax.lax.scan(body, acc0,
                          jnp.arange(n // chunk, dtype=jnp.int32))
    return acc


# -- bit-packed witness upload ----------------------------------------------
#
# Most rv32im/keccak witness columns are bits; uploading them as uint32
# wastes ~30x of host->device bandwidth (the dominant cost of small
# segments over the tunneled chip). The prover packs bit columns into
# uint32 words on host and reassembles the standard-form matrix on
# device with static gather/shift indices.


@functools.partial(jax.jit, static_argnames=("spec",))
def _unpack_main(packed, vals, spec):
    """(n, words) packed bits + (n, n_vals) values -> (n, main_cols) std."""
    word_idx = np.asarray(spec[0], np.int32)
    bit_off = jnp.asarray(np.asarray(spec[1], np.uint32))
    col_src = np.asarray(spec[2], np.int32)
    val_idx = np.asarray(spec[3], np.int32)
    bits = (packed[:, word_idx] >> bit_off[None, :]) & jnp.uint32(1)
    return jnp.where(jnp.asarray(col_src == 0)[None, :],
                     bits, vals[:, val_idx])


@functools.partial(jax.jit, static_argnames=("spec",))
def _select_main8(m8, vals, spec):
    """(n, cols) uint8 witness + (n, n_vals) u32 values -> (n, cols) std:
    bit columns from the byte matrix, value columns from vals."""
    col_src = np.asarray(spec[2], np.int32)
    val_idx = np.asarray(spec[3], np.int32)
    return jnp.where(jnp.asarray(col_src == 0)[None, :],
                     m8.astype(jnp.uint32), vals[:, val_idx])


# reusable host staging buffers (keyed by shape): fresh large allocations
# page-fault at ~1 ms/page on this VM class, turning a 0.3 s cast into
# tens of seconds — reuse keeps the pages resident
_STAGE_BUFS: dict = {}


def _staged(key, shape, dtype):
    buf = _STAGE_BUFS.get((key, shape, np.dtype(dtype).str))
    if buf is None:
        buf = np.empty(shape, dtype)
        _STAGE_BUFS[(key, shape, np.dtype(dtype).str)] = buf
    return buf


@functools.lru_cache(maxsize=None)
def _pack_spec(air_name: str):
    air = _AIRS[air_name]
    mask = np.asarray(air.main_bit_mask, bool)
    n_cols = mask.shape[0]
    word_idx = np.zeros(n_cols, dtype=np.int32)
    bit_off = np.zeros(n_cols, dtype=np.int32)
    col_src = np.ones(n_cols, dtype=np.int32)    # 0 = bit, 1 = value
    val_idx = np.zeros(n_cols, dtype=np.int32)
    b = v = 0
    for c in range(n_cols):
        if mask[c]:
            word_idx[c] = b // 32
            bit_off[c] = b % 32
            col_src[c] = 0
            b += 1
        else:
            val_idx[c] = v
            v += 1
    return (tuple(word_idx.tolist()), tuple(bit_off.tolist()),
            tuple(col_src.tolist()), tuple(val_idx.tolist())), mask, b, v


def _upload_main(air: Air, main_std: np.ndarray, shard_rows):
    """Host->device transfer of the main trace. For AIRs with a
    main_bit_mask the trace is bit-packed on host (C kernel), shipped
    packed over the tunnel, and unpacked on device; otherwise the u32
    trace is shipped raw. Returns the (n, main_cols) device array."""
    if getattr(air, "main_bit_mask", None) is None:
        return shard_rows(np.asarray(main_std, np.uint64).astype(np.uint32))
    register_air(air)
    spec, mask, n_bits, n_vals = _pack_spec(air.name)
    n, n_cols = main_std.shape
    val_idx = np.nonzero(~mask)[0]
    bit_idx = np.nonzero(mask)[0]
    n_words = (n_bits + 31) // 32
    with _Stage("    pack host"):
        # row-major C pack kernel (executor/csrc/pack.cpp): each 8 KB
        # witness row is bit-gathered while L1-resident, threaded over
        # row ranges (ctypes releases the GIL). Replaces the numpy
        # transpose+OR pipeline (1.7s -> ~0.2s at po2=18 on this host).
        from .. import staging
        from ..executor import pack_rows
        packed = _staged("packed", (n, n_words), np.uint32)
        vals = _staged("vals32", (n, max(len(val_idx), 1)), np.uint32)
        m64 = np.asarray(main_std, np.uint64)
        if not m64.flags.c_contiguous:
            m64 = np.ascontiguousarray(m64)
        n_chunks = min(staging._N_THREADS, max(1, n // 8192))
        step = -(-n // n_chunks)
        if n_chunks == 1:
            pack_rows(m64, bit_idx, val_idx, packed, vals, 0, n)
        else:
            futs = [staging._pool().submit(
                        pack_rows, m64, bit_idx, val_idx, packed, vals,
                        r0, min(r0 + step, n))
                    for r0 in range(0, n, step)]
            for f in futs:
                f.result()
    with _Stage("    put packed"):
        dm = shard_rows(packed)
        if _TIMING:
            jax.block_until_ready(dm)
    with _Stage("    put vals"):
        dv = shard_rows(vals)
        if _TIMING:
            jax.block_until_ready(dv)
    with _Stage("    unpack"):
        out = _unpack_main(dm, dv, spec)
        if _TIMING:
            out.block_until_ready()
    return out


def commit_main(air: Air, main_std: np.ndarray):
    """Commit the main group exactly as prove() does; returns
    (root (8,) np.uint64, handle) where handle can be passed back to
    prove(main_commit=handle) to reuse the upload/LDE/tree (used to
    pre-commit a companion proof's trace into another transcript via
    prove(extra_mix=...) before the shared challenges are sampled)."""
    n = main_std.shape[0]
    lde_std, _ = _lde_dispatch(None, n)
    dev = _upload_main(air, main_std, jnp.asarray)
    lde = lde_std(dev)
    tree = merkle.commit_rows(lde)
    root = np.asarray(jax.device_get(tree.root), np.uint64)
    return root, (dev, lde, tree)


def commit_main_root(air: Air, main_std: np.ndarray) -> np.ndarray:
    return commit_main(air, main_std)[0]


def _zinv_table(n: int) -> np.ndarray:
    """Montgomery (BLOWUP,) table of 1/(x^n - 1) on the LDE coset (4-periodic)."""
    gn = pow(GENERATOR, n, P)
    w4 = H.rou_fwd(BLOWUP)
    vals = [(gn * pow(w4, i, P) - 1) % P for i in range(BLOWUP)]
    return _to_monty_np([pow(v, P - 2, P) for v in vals])


# Air registry + cached constraint tapes. ``air.constraints()`` is
# captured ONCE into a linear tape (zeth_tpu.zkp.tape); the device then
# interprets the tape with a tiny fixed program, so XLA compile time is
# O(1) in circuit size (round-1's chunked-jit approach took ~33 min to
# compile the rv32im circuit — VERDICT.md).
_AIRS: dict[str, Air] = {}


def register_air(air: Air) -> None:
    _AIRS[air.name] = air


@functools.lru_cache(maxsize=None)
def _tape_program(air_name: str, n_publics: int):
    air = _AIRS[air_name]
    n_chal = air.n_challenges + getattr(air, "n_derived", 0)
    return tape.capture(
        air, n_publics,
        lambda cap: [tuple(cap.scalar(("chal", i, c)) for c in range(4))
                     for i in range(n_chal)])


def _row_sharder(mesh):
    """device_put-with-row-sharding when a mesh is given, else asarray."""
    if mesh is None:
        return jnp.asarray
    from jax.sharding import NamedSharding, PartitionSpec as PS
    sharding = NamedSharding(mesh, PS("rows"))
    return lambda a: jax.device_put(jnp.asarray(a), sharding)


def scalar_publics(air: Air, publics):
    """The leading publics that enter constraints as scalars."""
    n_ps = getattr(air, "n_public_scalars", None)
    return publics if n_ps is None else publics[:n_ps]


def all_challenges(air: Air, publics, sampled: np.ndarray,
                   derived_extra=None) -> np.ndarray:
    """Sampled challenges + the AIR's derived challenge-like scalars.

    derived_extra may be a callable taking the sampled challenges (the
    prover computes companion-bound values like d0/d1 only once the
    shared challenges exist) or a plain dict (the verifier passes the
    companion proof's public values)."""
    if not getattr(air, "n_derived", 0):
        return sampled
    if callable(derived_extra):
        derived_extra = derived_extra(sampled)
    derived = np.asarray(
        air.derived_challenges(publics, sampled, extra=derived_extra),
        np.uint64).reshape(-1, 4)
    return np.concatenate([sampled.reshape(-1, 4), derived], axis=0)


@jax.jit
def _finish_check(acc, zinv, sinv):
    q_evals = F.ext_mul_base(acc, zinv)              # (4n, 4)
    qc = ntt.intt(q_evals)                           # coset iNTT -> coeffs
    qc = F.mul(qc, sinv[:, None])
    n = qc.shape[0] // BLOWUP
    # split: 4 slices (k) x 4 ext components -> (n, 16), col = 4k + comp
    cols = qc.reshape(BLOWUP, n, 4)
    cols = jnp.swapaxes(cols, 0, 1).reshape(n, 16)   # coefficients of Q_k
    # Commit the check group as *evaluations on H* so the interpolating
    # polynomial of each column is exactly Q_{k,comp} (tap consistency).
    return ntt.ntt(cols)


def _check_group(air: Air, ldes: dict, alpha: np.ndarray, publics, challenges,
                 n: int, mesh=None):
    """Build the check group: Q = mix(C_i)/Z split into 16 base columns."""
    register_air(air)
    pubs_s = scalar_publics(air, publics)
    tp = _tape_program(air.name, len(pubs_s))
    # committed columns have degree <= n-1, so a total constraint degree
    # D gives deg(Q) <= D(n-1) - n <= 4n-1 exactly when D <= BLOWUP+1
    assert tp.max_degree <= BLOWUP + 1, \
        f"constraint degree {tp.max_degree} exceeds blowup+1 = {BLOWUP + 1}"
    alpha_pows = H.ext_powers(alpha, tp.n_stage)
    with _Stage(f"constraint tape ({tp.ops.shape[0]} ops, "
                f"{tp.n_stage} constraints)"):
        acc = tape.eval_check(tp, ldes, pubs_s, challenges, alpha_pows,
                              single_block=mesh is not None)
        acc.block_until_ready()
    return _finish_check(acc, _zinv_dev(n), _sinv_dev(n))


def _zinv_dev(n: int):
    return jnp.asarray(np.tile(_zinv_table(n), n))


def _sinv_dev(n: int):
    return base_power_series(
        jnp.asarray(np.uint32((pow(GENERATOR, P - 2, P) << 32) % P)),
        BLOWUP * n)


def _check_group_streamed(air: Air, coeffs1, ldes: dict, alpha, publics,
                          challenges, n: int):
    """_check_group for the streamed main group: the constraint tape
    evaluates coset by coset (stride=1 leaf offsets), interleaving the
    per-coset alpha-mixes back into natural LDE order — bit-identical
    to the resident-LDE evaluation."""
    register_air(air)
    pubs_s = scalar_publics(air, publics)
    tp = _tape_program(air.name, len(pubs_s))
    assert tp.max_degree <= BLOWUP + 1
    alpha_pows = H.ext_powers(alpha, tp.n_stage)
    parts = []
    with _Stage(f"constraint tape streamed ({tp.ops.shape[0]} ops)"):
        for r in range(BLOWUP):
            ev = _coset_eval(coeffs1, r, n)
            sub = {"main": ev}
            for g in ("control", "aux"):
                if g in ldes and ldes[g].shape[1]:
                    sub[g] = _coset_rows(ldes[g], r)
            parts.append(tape.eval_check(tp, sub, pubs_s, challenges,
                                         alpha_pows, stride=1))
            del ev, sub
        acc = _interleave4(tuple(parts))
    return _finish_check(acc, _zinv_dev(n), _sinv_dev(n))


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n_zg_groups", "strides"))
def _deep_mix_s4(groups, bps_z, chunk: int, n_zg_groups: int,
                 strides: tuple = None):
    """Beta-mixes of all committed columns on the stride-4 subdomain.

    mix_z(x) = sum_c beta^c f_c(x) is itself a degree-<n polynomial, so
    it is fully determined by the n stride-4 LDE rows (the coset
    g*<w_n>) — 4x less reduction work than mixing all 4n rows. The zg
    mix weights are beta^(n_z) * beta^j with the SAME beta^j as the z
    mix, so each prefix group's products are shared and the beta^(n_z)
    scale is applied downstream. Returns (n, 8): [:, :4] = mix over all
    groups, [:, 4:] = mix over the first n_zg_groups (control/main/aux).
    strides: per-group LDE stride (1 = the group array already holds
    only coset-0 rows — the streamed-main path).
    """
    if strides is None:
        strides = tuple(BLOWUP for _ in groups)
    n = groups[0].shape[0] // strides[0]

    def body(_, i):
        acc_z = jnp.zeros((chunk, 4), _U32)
        acc_pre = jnp.zeros((chunk, 4), _U32)
        for gi, (cat, bz) in enumerate(zip(groups, bps_z)):
            st = strides[gi]
            rc = jax.lax.dynamic_slice(
                cat, (i * chunk * st, 0),
                (chunk * st, cat.shape[1]))[::st]
            w = F.mul(rc[:, :, None], bz[None])
            s = ntt.modsum(w, axis=1)
            acc_z = F.add(acc_z, s)
            if gi < n_zg_groups:
                acc_pre = F.add(acc_pre, s)
        return None, jnp.concatenate([acc_z, acc_pre], axis=1)

    _, out = jax.lax.scan(body, None,
                          jnp.arange(n // chunk, dtype=jnp.int32))
    return out.reshape(n, 8)


@jax.jit
def _extend_coset_evals(vals):
    """(n, c) evaluations on g*<w_n> -> (4n, c) on g*<w_4n>. The coset
    shift cancels: with q(y) = f(g*y), our values are q on <w_n> and the
    target is q on <w_4n> — a plain (unshifted) blowup-4 LDE."""
    n, c = vals.shape
    coeffs = ntt.intt(vals)
    pad = jnp.zeros((n * (BLOWUP - 1), c), _U32)
    return ntt.ntt(jnp.concatenate([coeffs, pad], axis=0))


@jax.jit
def _deep_f0(mix4, beta_nz, cz, cpre, iz, izg):
    """f0(x) = [mix_z(x) - c_z]/(x - z)
             + beta^n_z * [mix_pre(x) - c_pre]/(x - zg)."""
    n4 = mix4.shape[0]
    num_z = F.ext_sub(mix4[:, :4], jnp.broadcast_to(cz, (n4, 4)))
    num_pre = F.ext_sub(mix4[:, 4:], jnp.broadcast_to(cpre, (n4, 4)))
    num_zg = F.ext_mul(num_pre, jnp.broadcast_to(beta_nz, (n4, 4)))
    return F.add(F.ext_mul(num_z, iz), F.ext_mul(num_zg, izg))


def _deep_combine(groups_z, n_zg_groups, beta_pows_z, beta_nz,
                  const_z, const_pre, inv_z, inv_zg, strides=None):
    if strides is None:
        strides = tuple(BLOWUP for _ in groups_z)
    n = groups_z[0].shape[0] // strides[0]
    chunk = min(n, 2048)
    mix_n = _deep_mix_s4(tuple(groups_z), tuple(beta_pows_z), chunk,
                         n_zg_groups, tuple(strides))
    mix4 = _extend_coset_evals(mix_n)
    return _deep_f0(mix4, beta_nz, const_z, const_pre, inv_z, inv_zg)


@jax.jit
def _open_groups(ldes_t, layers_t, q_idx, idx_mat):
    """Queried LDE rows + sibling digests for every group, one program."""
    rows = tuple(F.from_monty(lde[q_idx]) for lde in ldes_t)
    sibs = tuple(
        tuple(F.from_monty(layer[idx_mat[d]])
              for d, layer in enumerate(reversed(list(layers)[1:])))
        for layers in layers_t)
    return rows, sibs


@functools.partial(jax.jit, static_argnames=("off", "w"))
def _gather_chunk(x, q_idx, off: int, w: int):
    sl = jax.lax.slice_in_dim(x, off, off + w, axis=1)
    return F.from_monty(sl[q_idx])


def _gather_rows_chunked(x, q_idx):
    """Query-row extraction with bounded transients: XLA's row gather on
    a multi-GB tiled operand materializes a relayout copy of the WHOLE
    operand (the po2>=19 HBM blocker), so gather per <=1 GB column chunk
    — one DISPATCH per chunk (a single fused program hoists one
    whole-array relayout again). Returns standard-form host rows."""
    r, c = x.shape
    cw = max(64, (1 << 30) // (r * 4))
    parts = []
    for off in range(0, c, cw):
        w = min(cw, c - off)
        parts.append(np.asarray(
            jax.device_get(_gather_chunk(x, q_idx, off, w)), np.uint64))
    return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=1)


@jax.jit
def _gather_paths_t(layers_t, idx_mat):
    """Sibling digests for one tree at the (depth, Q) index matrix."""
    return tuple(F.from_monty(layer[idx_mat[d]])
                 for d, layer in enumerate(reversed(list(layers_t)[1:])))


def _open_groups_chunked(ldes_t, layers_t, q_idx, idx_mat):
    """_open_groups with the chunked row gather (huge-LDE safe).
    Host-side orchestration: one dispatch per column chunk per group."""
    rows = tuple(_gather_rows_chunked(lde, q_idx) for lde in ldes_t)
    sibs = tuple(jax.device_get(_gather_paths_t(tuple(layers), idx_mat))
                 for layers in layers_t)
    return rows, sibs


@jax.jit
def _point_inverses(x_pows, z_monty):
    """ext inverse of (x_i - z) for all LDE points. x_pows: (4n,) base."""
    diff0 = F.sub(x_pows, z_monty[0])
    rest = jnp.broadcast_to(F.neg(z_monty[1:]), x_pows.shape + (3,))
    diff = jnp.concatenate([diff0[..., None], rest], axis=-1)
    return F.ext_inv(diff)


@functools.partial(jax.jit, static_argnames=("n", "strides"))
def _taps_fused(groups, z_m, zg_m, n: int, strides: tuple = None):
    """Every DEEP tap in ONE program: the point-power and (x - z)^-1
    tables, the barycentric weights at z and z*w_n, and each group's
    stride-4 weighted reduction. Replaces ~15 per-group dispatches whose
    tunnel round-trip latency dominated the taps stage.

    groups: tuple of (4n, c) Montgomery LDEs. Returns (per-group (c, 8)
    Montgomery tap values ([:, :4] at z, [:, 4:] at z*w_n), inv_z,
    inv_zg) — the inverse tables are reused by the DEEP combination.
    """
    m4 = BLOWUP * n
    w4n = np.uint32((H.rou_fwd(m4) << 32) % P)
    g_m = np.uint32((GENERATOR << 32) % P)
    x_pows = F.mul(base_power_series(jnp.full((), w4n, _U32), m4),
                   jnp.full((), g_m, _U32))
    inv_z = _point_inverses(x_pows, z_m)
    inv_zg = _point_inverses(x_pows, zg_m)
    x4 = x_pows[::4]
    gn = pow(GENERATOR, n, P)
    den_inv = pow((n * gn) % P, P - 2, P)
    gn_ext = np.zeros(4, np.uint64)
    gn_ext[0] = gn
    gn_m = jnp.asarray(_to_monty_np(gn_ext))
    den_m = jnp.full((), np.uint32(((den_inv) << 32) % P), _U32)

    def bary(zz_m, inv4):
        zn = F.ext_pow_const(zz_m, n)
        k = F.ext_mul_base(F.ext_sub(zn, gn_m), den_m)
        mk = F.neg(k)
        return F.ext_mul(F.ext_mul_base(inv4, x4),
                         jnp.broadcast_to(mk, (n, 4)))

    bw_pair = jnp.concatenate(
        [bary(z_m, inv_z[::4]), bary(zg_m, inv_zg[::4])], axis=1)
    chunk = min(4096, n)
    if strides is None:
        strides = tuple(4 for _ in groups)
    outs = tuple(_eval_rows_ext_s4(lde, bw_pair, chunk, st)
                 for lde, st in zip(groups, strides))
    return outs, inv_z, inv_zg


import os as _os
import sys as _sys
import time as _time

_TIMING = _os.environ.get("ZETH_TIMING", "0") == "1"


class _Stage:
    """Context timer: prints prover stage timings when ZETH_TIMING=1."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = _time.time()

    def __exit__(self, *a):
        if _TIMING:
            print(f"[prover] {self.name}: {_time.time() - self.t0:.2f}s",
                  file=_sys.stderr, flush=True)


def prove(air: Air, main_std: np.ndarray, publics: list[int],
          mesh=None, derived_extra=None, extra_mix=None,
          main_commit=None) -> StarkProof:
    """Prove one AIR execution. main_std: (n, main_cols) standard-form trace.

    mesh: optional jax.sharding.Mesh with a "rows" axis — the witness,
    LDEs, Merkle layers, constraint tape and FRI then run sharded over
    the mesh (XLA GSPMD inserts the collectives; the hand-scheduled
    four-step NTT in zeth_tpu.parallel is the drop-in for the LDE when
    profiling favors it). Output seals are bit-identical to single-device
    proving.
    """
    n, c_main = main_std.shape
    assert c_main == air.main_cols and n & (n - 1) == 0
    po2 = n.bit_length() - 1

    shard_rows = _row_sharder(mesh)
    lde_std, lde_monty = _lde_dispatch(mesh, n)

    t = Transcript()
    t.mix_values(np.array([po2] + [int(p) for p in publics], dtype=np.uint64))

    # --- commit control / main ------------------------------------------
    # keep the std-form device arrays when the AIR can build its aux
    # group on device (no host aux matrix, no second big upload)
    device_aux = mesh is None and hasattr(air, "build_aux_device")
    ldes, trees, roots = {}, {}, {}
    dev_std = {}
    control_std = air.control_trace(po2)
    # dispatch the main upload FIRST: the multi-MB tunnel transfer then
    # overlaps the control group's commit (the transcript's device_get
    # of each root is the only hard sync point)
    # streamed main group: the blowup-4 main LDE exceeds HBM (po2>=20);
    # keep shifted coefficients resident, recompute cosets on demand
    stream_main = (mesh is None and main_commit is None
                   and BLOWUP * n * air.main_cols * 4 > _STREAM_MAIN_BYTES)
    main_coeffs = None
    main_dev = None
    if main_commit is None:
        with _Stage("main upload (async)"):
            main_dev = _upload_main(air, main_std, shard_rows)
    for gname in ("control", "main"):
        if gname == "main" and main_commit is not None:
            dev, ldes["main"], trees["main"] = main_commit
            if device_aux:
                dev_std["main"] = dev
            roots["main"] = trees["main"].root
            t.mix(roots["main"])
            continue
        if gname == "main" and stream_main:
            with _Stage("commit main (streamed cosets)"):
                dev = main_dev
                main_dev = None
                main_coeffs = _shifted_coeffs(dev)
                if device_aux:
                    dev_std["main"] = dev
                del dev
                dparts = []
                for r in range(BLOWUP):
                    ev = _coset_eval(main_coeffs, r, n)
                    dparts.append(merkle.leaf_digests(ev))
                    del ev
                trees["main"] = merkle.commit_digests(
                    _interleave4(tuple(dparts)))
                del dparts
                roots["main"] = trees["main"].root
            t.mix(roots["main"])
            continue
        with _Stage(f"commit {gname}"):
            with _Stage(f"  {gname} upload"):
                if gname == "main":
                    dev = main_dev
                    main_dev = None
                else:
                    dev = shard_rows(
                        np.asarray(control_std, np.uint64).astype(np.uint32))
                if _TIMING:
                    dev.block_until_ready()
            with _Stage(f"  {gname} lde"):
                ldes[gname] = lde_std(dev)
                if _TIMING:
                    ldes[gname].block_until_ready()
            if device_aux:
                dev_std[gname] = dev
            del dev          # the standard-form upload buffer is ~1 GB at po2=18
            with _Stage(f"  {gname} tree"):
                trees[gname] = merkle.commit_rows(ldes[gname])
                if _TIMING:
                    jax.block_until_ready(trees[gname].layers[-1])
            roots[gname] = trees[gname].root
        t.mix(roots[gname])

    # companion-proof commitment (e.g. the paging proof's main root):
    # mixed before challenge sampling so witness bound by the companion
    # is committed before the shared challenges exist (LogUp ordering)
    if extra_mix is not None:
        t.mix(np.asarray(extra_mix, np.uint64).reshape(8))

    # --- aux group -------------------------------------------------------
    sampled = np.stack([t.sample_ext() for _ in range(air.n_challenges)]) \
        if air.n_challenges else np.zeros((0, 4), dtype=np.uint64)
    challenges = all_challenges(air, publics, sampled, derived_extra)
    if air.aux_cols:
        with _Stage("commit aux"):
            if device_aux:
                aux_m = air.build_aux_device(dev_std["main"],
                                             dev_std["control"], challenges)
                dev_std.clear()
                ldes["aux"] = lde_monty(aux_m)
                del aux_m
            else:
                aux_std = air.build_aux(np.asarray(main_std, np.uint64),
                                        challenges)
                aux32 = _staged("aux32", tuple(aux_std.shape), np.uint32)
                np.copyto(aux32, np.asarray(aux_std, np.uint64),
                          casting="unsafe")
                dev = shard_rows(aux32)
                ldes["aux"] = lde_std(dev)
            trees["aux"] = merkle.commit_rows(ldes["aux"])
            roots["aux"] = trees["aux"].root
        t.mix(roots["aux"])
    else:
        ldes["aux"] = jnp.zeros((BLOWUP * n, 0), _U32)

    # --- composition / check group --------------------------------------
    alpha = t.sample_ext()
    with _Stage("check group"):
        if stream_main:
            check_cols = _check_group_streamed(air, main_coeffs, ldes,
                                               alpha, publics, challenges, n)
        else:
            check_cols = _check_group(air, ldes, alpha, publics,
                                      challenges, n, mesh=mesh)
        ldes["check"] = lde_monty(check_cols)
        trees["check"] = merkle.commit_rows(ldes["check"])
        roots["check"] = trees["check"].root
    t.mix(roots["check"])

    # --- DEEP taps -------------------------------------------------------
    # Evaluated barycentrically from the LDE evaluations (no coefficient
    # arrays are kept — they double HBM at po2>=18). On the coset gH of
    # size 4n: f(z) = K(z) * sum_i f(x_i) * x_i / (z - x_i) with
    # K(z) = (z^4n - g^4n) / (4n * g^4n); we fold the sign of the
    # precomputed 1/(x_i - z) table into K.
    z = t.sample_ext()
    _tap_t0 = _time.time()
    w_n = H.rou_fwd(n)
    zg = H.ext_mul(H.ext(z), H.ext(w_n))
    # Every committed column has degree < n, so its tap interpolates
    # exactly from the n stride-4 LDE rows (the coset g*<w_n>) — 4x less
    # work than the full 4n-row reduction. One fused program computes
    # every group's taps plus the DEEP inverse tables.
    def _gwidth(g):
        if g == "main" and stream_main:
            return air.main_cols
        return ldes[g].shape[1]

    gnames = [g for g in ("control", "main", "aux", "check")
              if _gwidth(g) > 0]
    # streamed main: coset-0 evaluations stand in for the stride-4 rows
    main_ev0 = _coset_eval(main_coeffs, 0, n) if stream_main else None

    def _grows(g):
        return main_ev0 if (g == "main" and stream_main) else ldes[g]

    def _gstride(g):
        return 1 if (g == "main" and stream_main) else 4

    gv_dev, inv_z, inv_zg = _taps_fused(
        tuple(_grows(g) for g in gnames),
        jnp.asarray(_to_monty_np(z)), jnp.asarray(_to_monty_np(zg)), n,
        tuple(_gstride(g) for g in gnames))
    rinv = np.uint64(pow(1 << 32, P - 2, P))
    group_vals = {
        g: np.asarray(jax.device_get(v), np.uint64) * rinv % np.uint64(P)
        for g, v in zip(gnames, gv_dev)}
    tap_vals = []
    for (gname, offset) in TAP_STREAMS:
        if _gwidth(gname) == 0:
            tap_vals.append(np.zeros((0, 4), dtype=np.uint64))
            continue
        tap_vals.append(group_vals[gname][:, 4 * offset:4 * offset + 4])
    if _TIMING:
        print(f"[prover] taps: {_time.time() - _tap_t0:.2f}s",
              file=_sys.stderr, flush=True)
    taps = np.concatenate(tap_vals, axis=0)
    with _Stage("mix taps"):
        t.mix_values(taps.reshape(-1))

    # --- DEEP combination ------------------------------------------------
    beta = t.sample_ext()
    n_z = air.control_cols + air.main_cols + air.aux_cols + 16
    n_zg = air.control_cols + air.main_cols + air.aux_cols
    beta_pows = H.ext_powers(beta, n_z + n_zg)            # (ntaps, 4) std
    const_z = np.zeros(4, dtype=np.uint64)
    const_pre = np.zeros(4, dtype=np.uint64)     # const_zg / beta^n_z
    for j in range(n_z):
        const_z = H.ext_add(const_z, H.ext_mul(beta_pows[j], taps[j]))
    for j in range(n_zg):
        const_pre = H.ext_add(const_pre,
                              H.ext_mul(beta_pows[j], taps[n_z + j]))

    # The DEEP combination orders zg-groups first in the beta-power
    # stream (weights beta^(n_z + j) for the control/main/aux prefix);
    # _deep_stage factors beta^n_z out so both mixes share one set of
    # per-column products.
    groups_z, bps_z, strides_z = [], [], []
    off = 0
    for g in ("control", "main", "aux", "check"):
        c = _gwidth(g)
        if c:
            groups_z.append(_grows(g))
            strides_z.append(_gstride(g))
            bps_z.append(jnp.asarray(_to_monty_np(beta_pows[off:off + c])))
        off += c
    n_zg_groups = sum(1 for g in ("control", "main", "aux")
                      if _gwidth(g))
    with _Stage("deep setup"):
        pass
    f0 = _deep_combine(tuple(groups_z), n_zg_groups, tuple(bps_z),
                       jnp.asarray(_to_monty_np(beta_pows[n_z])),
                       jnp.asarray(_to_monty_np(const_z)),
                       jnp.asarray(_to_monty_np(const_pre)),
                       inv_z, inv_zg, strides=tuple(strides_z))

    # --- FRI + query openings -------------------------------------------
    with _Stage("fri"):
        fri_proof, qs = fri.prove(f0, GENERATOR, n, t)
    # the DEEP working set is dead after FRI; at po2>=19 the openings
    # gather needs that HBM back
    del f0, groups_z, bps_z, inv_z, inv_zg, gv_dev, main_ev0
    openings = {}
    q_idx = jnp.asarray(np.array(qs, dtype=np.int32))
    with _Stage("openings"):
        # all group rows + all sibling paths in ONE device dispatch and
        # ONE host transfer (per-group roundtrips dominate on tunneled
        # chips; the full LDEs are huge so only queried rows move)
        depth = len(trees[gnames[0]].layers) - 1
        idx_rows = []
        idxs = list(qs)
        for _ in range(depth):
            idx_rows.append([i ^ 1 for i in idxs])
            idxs = [i >> 1 for i in idxs]
        idx_mat = jnp.asarray(np.array(idx_rows, np.int32)) if depth else \
            jnp.zeros((0, len(qs)), jnp.int32)
        open_names = [g for g in gnames
                      if not (g == "main" and stream_main)]
        if BLOWUP * n * sum(ldes[g].shape[1] for g in open_names) \
                <= _LDE_CHUNK_THRESHOLD:
            rows_t, sibs_t = jax.device_get(_open_groups(
                tuple(ldes[g] for g in open_names),
                tuple(tuple(trees[g].layers) for g in open_names),
                q_idx, idx_mat))
        else:
            # huge traces: chunked row gather bounds the relayout
            # transient to ~1 GB per column chunk
            rows_t, sibs_t = jax.device_get(_open_groups_chunked(
                tuple(ldes[g] for g in open_names),
                tuple(tuple(trees[g].layers) for g in open_names),
                q_idx, idx_mat))
        main_rows = main_sibs = None
        if stream_main:
            # main rows evaluate straight from the coefficients (no LDE
            # exists); sibling digests come from the resident tree
            w4n = H.rou_fwd(BLOWUP * n)
            pts = np.array([pow(w4n, int(q), P) for q in qs], np.uint64)
            rows_m = _eval_rows_at_points(
                main_coeffs, jnp.asarray(_to_monty_np(pts)), n)
            main_rows = np.asarray(
                jax.device_get(F.from_monty(rows_m)), np.uint64)
            main_sibs = [np.asarray(s, np.uint64) for s in jax.device_get(
                _gather_paths_t(tuple(trees["main"].layers), idx_mat))]
        for g in ("control", "main", "aux", "check"):
            if g not in gnames:
                openings[g] = GroupOpening(
                    rows=np.zeros((len(qs), 0), dtype=np.uint64), paths=[])
                continue
            if g == "main" and stream_main:
                sib_layers = main_sibs
                rows_g = main_rows
            else:
                gi = open_names.index(g)
                sib_layers = [np.asarray(s, np.uint64) for s in sibs_t[gi]]
                rows_g = np.asarray(rows_t[gi], np.uint64)
            paths = [np.stack([sib_layers[d][qi] for d in range(depth)])
                     if depth else np.zeros((0, 8), np.uint64)
                     for qi in range(len(qs))]
            openings[g] = GroupOpening(rows=rows_g, paths=paths)

    return StarkProof(air_name=air.name, po2=po2, publics=list(publics),
                      roots=roots, taps=taps, fri_proof=fri_proof,
                      openings=openings, query_indices=qs)
