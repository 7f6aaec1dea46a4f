"""MXU field-matmul + four-step NTT vs the host/radix-2 oracles.

The int8 digit-decomposition matmuls (zeth_tpu/mxu.py) must be exact
mod-p arithmetic — bit-identical to the VPU Montgomery path — for every
operand distribution, including adversarial all-0xFF... patterns that
maximize the signed digit products.
"""

import numpy as np
import jax.numpy as jnp

from zeth_tpu import field as F, hostmath as H, mxu, ntt
from zeth_tpu.field import P


def _rand(shape, rng):
    return rng.integers(0, P, size=shape, dtype=np.uint64)


def _to_m(a):
    return ((np.asarray(a, np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def test_modmm_exact():
    rng = np.random.default_rng(7)
    a = _rand((33, 300), rng)
    b = _rand((300, 5), rng)
    want = np.zeros((33, 5), dtype=object)
    aa = a.astype(object)
    bb = b.astype(object)
    want = (aa @ bb) % P
    # a Montgomery, b standard -> Montgomery result
    got = np.asarray(F.from_monty(mxu.modmm(jnp.asarray(_to_m(a)),
                                            jnp.asarray(b.astype(np.uint32)))))
    assert (got == want.astype(np.uint64)).all()


def test_modmm_tn_adversarial():
    # worst-case digits: values with 0x80 byte patterns drive every
    # signed digit to the -128 corner
    rng = np.random.default_rng(8)
    k = (1 << 16) + 512     # force the k-chunking path
    a = np.full((k, 3), 0x78000000 - 0x7F7F80, np.uint64)
    b = np.full((k, 2), 0x70808080, np.uint64)
    a[::3, 0] = rng.integers(0, P, size=a[::3, 0].shape)
    want = (a.astype(object).T @ b.astype(object)) % P
    got = np.asarray(F.from_monty(mxu.modmm_tn(
        jnp.asarray(_to_m(a)), jnp.asarray(b.astype(np.uint32)))))
    assert (got == want.astype(np.uint64)).all()


def test_ntt_fs_matches_radix2():
    rng = np.random.default_rng(9)
    for n in (64, 128, 1024):
        x = jnp.asarray(_to_m(_rand((n, 9), rng)))
        want = np.asarray(ntt.ntt_jit(x))
        got = np.asarray(mxu.ntt_fs(x))
        assert (got == want).all(), f"ntt n={n}"
        wanti = np.asarray(ntt.intt_jit(x))
        goti = np.asarray(mxu.ntt_fs(x, inverse=True))
        assert (goti == wanti).all(), f"intt n={n}"


def test_coset_lde_fs_matches():
    rng = np.random.default_rng(10)
    n = 256
    x = jnp.asarray(_to_m(_rand((n, 7), rng)))
    want = np.asarray(ntt.coset_lde_jit(x))
    got = np.asarray(mxu.coset_lde_fs(x))
    assert (got == want).all()


def test_coset_lde_fs_column_blocks():
    rng = np.random.default_rng(11)
    n = 64
    c = mxu.FS_COL_BLOCK + 17        # force the tail block
    x = jnp.asarray(_to_m(_rand((n, c), rng)))
    want = np.asarray(ntt.coset_lde_jit(x))
    got = np.asarray(mxu.coset_lde_fs(x))
    assert (got == want).all()
