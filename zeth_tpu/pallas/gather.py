"""Pallas TPU kernel: query-row extraction from huge LDE matrices.

The FRI query openings need ~50 arbitrary rows of each committed group
LDE. XLA lowers both `x[idx]` gathers and per-row dynamic slices on a
multi-GB operand through a full linear-layout copy of the operand
(16 GB HBM at po2=19 — the round-4 blocker, ROADMAP.md). This kernel
scalar-prefetches the row indices and DMAs ONLY the requested (1, C)
row blocks out of HBM: traffic is queries x row-bytes, independent of
the matrix height.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32


def _copy_kernel(idx_ref, in_ref, out_ref):
    out_ref[...] = in_ref[...]


@jax.jit
def gather_rows(x, idx):
    """x: (R, C) u32; idx: (Q,) int32 row indices -> (Q, C).

    Mosaic blocks must be 8-sublane aligned, so the kernel copies the
    aligned (8, C) band containing each queried row; the final row
    select runs on the tiny (Q*8, C) result.
    """
    q = idx.shape[0]
    c = x.shape[1]
    base = (idx // 8).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q,),
        in_specs=[pl.BlockSpec((8, c), lambda i, base_ref: (base_ref[i], 0))],
        out_specs=pl.BlockSpec((8, c), lambda i, base_ref: (i, 0)),
    )
    bands = pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8 * q, c), x.dtype),
    )(base, x)
    off = (idx % 8).astype(jnp.int32)
    return bands.reshape(q, 8, c)[jnp.arange(q), off]
