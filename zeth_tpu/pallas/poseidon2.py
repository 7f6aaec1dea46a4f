"""Pallas TPU kernel: fused Poseidon2 sponge leaf hash.

Replaces the XLA absorb-scan path of zeth_tpu.hash.poseidon2.hash_rows
for Merkle leaf hashing of trace-LDE matrices (the prover's dominant
hash cost — risc0-zkp commits every group's 4n-row LDE, SURVEY.md §2.2).

Why a kernel: the XLA path round-trips the (24, R) sponge state through
HBM once per permutation round (50 rounds x ~64 absorb chunks for the
1009-column rv32im main group = ~600 GB of state traffic at po2=18).
Here one grid step loads a (C, 1024)-row tile into VMEM once and runs
the ENTIRE absorb chain in registers/VMEM: HBM traffic drops to one
read of the matrix plus one 32-byte-per-row digest write.

Layout: the batch (rows) must ride the 128-lane axis for full VPU
utilization, so the caller feeds the matrix TRANSPOSED and tiled as
(C16, G, 8, 128) — C16 = columns zero-padded to a RATE multiple (the
sponge zero-pads ragged chunks identically, so padded columns do not
change digests), G = R/1024 row tiles, each (8, 128) = one VPU tile of
1024 rows. Every Poseidon2 cell is then an (8, 128) tile and the whole
permutation is straight-line VPU code. Round constants come in via SMEM
(dynamic round indexing); the internal-diagonal constants are baked in
as immediates.

Bit-identical to hash.poseidon2.hash_rows (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import field as F
from ..hash import poseidon2 as P2

_U32 = jnp.uint32
TILE = 1024               # rows per grid step (8 sublanes x 128 lanes)
CELLS = P2.CELLS
RATE = P2.RATE
DIGEST = P2.DIGEST_LEN


def _sbox(x):
    x2 = F.mul(x, x)
    x4 = F.mul(x2, x2)
    return F.mul(F.mul(x4, x2), x)


def _m4_cells(cells):
    outs = []
    for b in range(CELLS // 4):
        x0, x1, x2, x3 = cells[4 * b:4 * b + 4]
        t0 = F.add(x0, x1)
        t1 = F.add(x2, x3)
        t2 = F.add(F.add(x1, x1), t1)
        t3 = F.add(F.add(x3, x3), t0)
        t4 = F.add(F.add(F.add(t1, t1), F.add(t1, t1)), t3)
        t5 = F.add(F.add(F.add(t0, t0), F.add(t0, t0)), t2)
        outs.extend([F.add(t3, t5), t5, F.add(t2, t4), t4])
    return outs


def _external_cells(cells):
    z = _m4_cells(cells)
    s = list(z[0:4])
    for b in range(1, CELLS // 4):
        for j in range(4):
            s[j] = F.add(s[j], z[4 * b + j])
    return [F.add(z[i], s[i % 4]) for i in range(CELLS)]


def _permute(cells, rc_ext_ref, rc_int_ref, diag_m1):
    """Full Poseidon2 permutation on a 24-tuple of (8, 128) tiles.

    rc_ext_ref: (8, 24) SMEM; rc_int_ref: (21, 1) SMEM; diag_m1: python
    ints (immediates). Round loops are lax.fori_loop with the cells
    tuple as carry — Mosaic keeps the 24 tiles in vector registers/VMEM.
    """
    half = P2.ROUNDS_FULL // 2

    def ext_round(r, cells):
        cs = [F.add(cells[i], rc_ext_ref[r, i]) for i in range(CELLS)]
        return tuple(_external_cells([_sbox(c) for c in cs]))

    def int_round(r, cells):
        cs = list(cells)
        cs[0] = _sbox(F.add(cs[0], rc_int_ref[r, 0]))
        t = cs
        while len(t) > 1:
            nxt = [F.add(t[i], t[i + 1]) for i in range(0, len(t) - 1, 2)]
            if len(t) % 2:
                nxt.append(t[-1])
            t = nxt
        s = t[0]
        return tuple(F.add(s, F.mul(cs[i], jnp.uint32(diag_m1[i])))
                     for i in range(CELLS))

    cells = tuple(_external_cells(list(cells)))
    cells = jax.lax.fori_loop(0, half, ext_round, cells)
    cells = jax.lax.fori_loop(0, P2.ROUNDS_PARTIAL, int_round, cells)
    cells = jax.lax.fori_loop(half, P2.ROUNDS_FULL, ext_round, cells)
    return cells


def _leaf_kernel(nch: int, diag_m1: tuple, first: bool, last: bool,
                 rc_ext_ref, rc_int_ref, xt_ref, st_ref, out_ref,
                 stout_ref):
    if first:
        zero = jnp.zeros((8, 128), _U32)
        cells0 = tuple(zero for _ in range(CELLS))
    else:
        cells0 = tuple(st_ref[0, j] for j in range(CELLS))

    def chunk(k, cells):
        blk = xt_ref[pl.ds(k * RATE, RATE), 0]
        cs = tuple(F.add(cells[j], blk[j]) for j in range(RATE)) \
            + cells[RATE:]
        return _permute(cs, rc_ext_ref, rc_int_ref, diag_m1)

    cells = jax.lax.fori_loop(0, nch, chunk, cells0)
    if last:
        for j in range(DIGEST):
            out_ref[0, j] = cells[j]
    else:
        for j in range(CELLS):
            stout_ref[0, j] = cells[j]


@functools.partial(jax.jit,
                   static_argnames=("nch", "diag", "first", "last"))
def _leaf_call(xt4, state, rc_ext, rc_int, nch: int, diag: tuple,
               first: bool, last: bool):
    """One column-slab absorb over every row tile. state: (G, 24, 8,
    128) sponge cells carried between slabs (ignored when first)."""
    cp, g = xt4.shape[0], xt4.shape[1]
    kernel = functools.partial(_leaf_kernel, nch, diag, first, last)
    out_cells = DIGEST if last else CELLS
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((P2.ROUNDS_FULL, CELLS),
                         lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((P2.ROUNDS_PARTIAL, 1),
                         lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((cp, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CELLS, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, DIGEST, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CELLS, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, DIGEST, 8, 128), _U32),
            jax.ShapeDtypeStruct((g, CELLS, 8, 128), _U32),
        ),
    )(rc_ext, rc_int, xt4, state)
    return out


@functools.lru_cache(maxsize=1)
def _smem_constants():
    mc = P2._monty_constants()
    rc_ext = np.asarray(mc["rc_ext"], np.uint32)            # (8, 24)
    rc_int = np.asarray(mc["rc_int"], np.uint32).reshape(-1, 1)
    diag = tuple(int(v) for v in np.asarray(mc["diag_m1"]))
    return rc_ext, rc_int, diag


@functools.partial(jax.jit, static_argnames=("off", "c", "pad"))
def _transpose_pad(x, off: int, c: int, pad: int):
    """Columns [off, off+c) transposed + tiled: (c+pad, G, 8, 128)."""
    sl = jax.lax.slice_in_dim(x, off, off + c, axis=1)
    if pad:
        sl = jnp.concatenate(
            [sl, jnp.zeros((sl.shape[0], pad), _U32)], axis=1)
    xt = sl.T
    cp = xt.shape[0]
    return xt.reshape(cp, xt.shape[1] // TILE, 8, 128)


def supported(shape) -> bool:
    r, c = shape
    return r % TILE == 0 and r >= TILE and c > 0


# column-slab staging budget: bounds the transposed copy of one absorb
# call (slab_cols * R * 4 bytes) — the whole-matrix transpose was an
# 8 GB HBM temp beside the resident 8.4 GB LDE at po2=19
SLAB_BYTES = 1 << 29


def _slab_cols(r: int) -> int:
    w = SLAB_BYTES // (r * 4)
    return max(RATE, min(512, (w // RATE) * RATE))


def hash_rows(rows):
    """Drop-in for hash.poseidon2.hash_rows on (R, C) Montgomery input.

    R must be a TILE multiple (all LDE domains are); any C. Wide
    matrices stream in SLAB_COLS column slabs with the sponge state
    carried in an (G, 24, 8, 128) HBM buffer between calls. Returns
    (R, 8) Montgomery digests, bit-identical to the XLA path.
    """
    r, c = rows.shape
    assert supported((r, c))
    rc_ext, rc_int, diag = _smem_constants()
    rc_ext = jnp.asarray(rc_ext)
    rc_int = jnp.asarray(rc_int)
    g = r // TILE
    state = jnp.zeros((g, CELLS, 8, 128), _U32)
    digests = None
    off = 0
    slab = _slab_cols(r)
    while off < c:
        cw = min(slab, c - off)
        pad = (-cw) % RATE
        xt4 = _transpose_pad(rows, off, cw, pad)
        first = off == 0
        last = off + cw >= c
        digests, state = _leaf_call(xt4, state, rc_ext, rc_int,
                                    (cw + pad) // RATE, diag, first, last)
        off += cw
    # (G, 8cell, 8sub, 128lane) -> (R, 8): row r = g*1024 + s*128 + l
    return jnp.transpose(digests, (0, 2, 3, 1)).reshape(r, DIGEST)
