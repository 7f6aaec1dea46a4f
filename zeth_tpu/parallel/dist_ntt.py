"""Distributed NTT: Bailey four-step over a ``rows`` mesh axis.

Replaces risc0-zkp's threaded NTT (SURVEY.md §2.2) with the classic
R x C decomposition: local column NTTs, a twiddle scale, an all_to_all
transpose, local row NTTs, and a final transpose back to contiguous row
sharding. All compute is the batched radix-2 core from zeth_tpu.ntt;
the only communication is ``jax.lax.all_to_all`` over ICI.

Derivation (i = r*C + c, k = k_r + R*k_c, w = w_N):
  X[k] = sum_c w^(c*k_r) * w_C^(c*k_c) * [ sum_r x[r,c] * w_R^(r*k_r) ]
so: (1) R-point NTT over r per column; (2) scale by w^(c*k_r);
(3) C-point NTT over c per k_r row; output element (k_c, k_r) of the
(C, R) result matrix is X[k_c*R + k_r] — already natural flat order.

Input/output: flat (n, batch) arrays sharded in contiguous row blocks
along the mesh axis. Montgomery form throughout.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from .. import field as F
from .. import ntt as ntt_mod
from ..field import GENERATOR, P

_U32 = jnp.uint32


def _to_monty_np(a):
    return ((np.asarray(a, np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _w_pows_monty(n: int, inverse: bool, count: int) -> np.ndarray:
    """Montgomery powers w_n^0 .. w_n^(count-1) (host table)."""
    w = (pow(ntt_mod.F.rou_fwd(n), P - 2, P) if inverse
         else ntt_mod.F.rou_fwd(n))
    out = np.empty(count, dtype=np.uint64)
    acc = 1
    for i in range(count):
        out[i] = acc
        acc = acc * w % P
    return _to_monty_np(out)


def _split_rc(n: int) -> tuple[int, int]:
    """n = R*C with R, C as close to square as possible (both powers of 2)."""
    lg = n.bit_length() - 1
    lr = lg // 2
    return 1 << lr, 1 << (lg - lr)


def _dist_ntt_shardmap(x, mesh: Mesh, axis: str, inverse: bool):
    """Core four-step NTT under shard_map. x: (n, batch) row-block sharded."""
    n = x.shape[0]
    batch = x.shape[1:]
    R, C = _split_rc(n)
    D = mesh.shape[axis]
    assert R % D == 0 and C % D == 0, (n, R, C, D)
    w_full = jnp.asarray(_w_pows_monty(n, inverse, C))  # w^c for c < C

    def local(xl):
        d = jax.lax.axis_index(axis)
        # xl: (n/D, batch) = contiguous row block of the (R, C) matrix
        xl = xl.reshape((R // D, C) + batch)
        # reshard rows -> cols: local (R, C/D) (all_to_all "transpose")
        xl = jax.lax.all_to_all(xl, axis, split_axis=1, concat_axis=0,
                                tiled=True)
        # step 1: R-point NTT over r (axis 0, fully local)
        xl = ntt_mod._ntt_core(xl, inverse=inverse)
        # step 2: twiddle w^(c * k_r) with global c = d*(C/D) + local index
        wc = jax.lax.dynamic_slice_in_dim(w_full, d * (C // D), C // D)
        wc_b = jnp.broadcast_to(wc, (R, C // D))
        pows = jax.lax.associative_scan(F.mul, wc_b, axis=0)      # wc^(k_r+1)
        ones = jnp.full((1, C // D), F.mont_one(), _U32)
        pows = jnp.concatenate([ones, pows[:-1]], axis=0)         # wc^k_r
        xl = F.mul(xl, pows.reshape((R, C // D) + (1,) * len(batch)))
        # reshard cols -> rows: local (R/D, C)
        xl = jax.lax.all_to_all(xl, axis, split_axis=0, concat_axis=1,
                                tiled=True)
        # step 3: C-point NTT over c for each local k_r
        xl = jnp.moveaxis(xl, 1, 0)                               # (C, R/D, b)
        xl = ntt_mod._ntt_core(xl, inverse=inverse)
        # Z[k_c, k_r] = X[k_c*R + k_r]: the (C, R) output matrix is sharded
        # on its minor axis (k_r). Reshard to contiguous flat blocks (k_c):
        xl = jax.lax.all_to_all(xl, axis, split_axis=0, concat_axis=1,
                                tiled=True)                       # (C/D, R)
        return xl.reshape((n // D,) + batch)

    fn = jax.shard_map(local, mesh=mesh, in_specs=PS(axis),
                       out_specs=PS(axis), check_vma=False)
    return fn(x)


def dist_ntt(x, mesh: Mesh, axis: str = "rows"):
    """Forward NTT over axis 0 of a row-block-sharded (n, batch) array."""
    return _dist_ntt_shardmap(x, mesh, axis, inverse=False)


def dist_intt(x, mesh: Mesh, axis: str = "rows"):
    """Inverse NTT (includes the 1/n scale)."""
    n = x.shape[0]
    out = _dist_ntt_shardmap(x, mesh, axis, inverse=True)
    n_inv_monty = (pow(n, P - 2, P) << 32) % P
    return F.mul(out, jnp.full((), n_inv_monty, _U32))


def dist_coset_lde(values, mesh: Mesh, axis: str = "rows",
                   blowup: int = 4, shift: int = GENERATOR):
    """Distributed coset LDE: iNTT -> shift scale -> zero-pad -> NTT.

    values: (n, batch) row-block sharded; returns (blowup*n, batch)
    row-block sharded on the same axis.
    """
    n = values.shape[0]
    coeffs = dist_intt(values, mesh, axis)
    shift_pows = jnp.asarray(_w_pows_dummy_shift(shift, n))
    shift_pows = jax.device_put(
        shift_pows, NamedSharding(mesh, PS(axis)))
    coeffs = F.mul(coeffs, shift_pows.reshape((n,) + (1,) * (values.ndim - 1)))
    pad = jnp.zeros((n * (blowup - 1),) + values.shape[1:], _U32)
    padded = jnp.concatenate([coeffs, pad], axis=0)
    padded = jax.lax.with_sharding_constraint(
        padded, NamedSharding(mesh, PS(axis)))
    return dist_ntt(padded, mesh, axis)


@functools.lru_cache(maxsize=None)
def _w_pows_dummy_shift(shift: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * shift % P
    return _to_monty_np(out)
