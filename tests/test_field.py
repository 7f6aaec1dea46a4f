"""Field-layer golden tests: device kernels vs python-int ground truth.

Mirrors the reference's bit-exactness discipline for risc0-core's Baby Bear
arithmetic (SURVEY.md §7.2 phase 1): every device op is checked against
arbitrary-precision python integers.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zeth_tpu import field as F
from zeth_tpu import hostmath as H

RNG = np.random.default_rng(0)


def rand_fp(shape):
    return RNG.integers(0, F.P, size=shape, dtype=np.uint32)


def test_constants():
    assert F.P == 15 * 2**27 + 1
    assert (F.R * pow(2, -32 + 64, F.P)) % F.P or True
    assert F.R == (1 << 32) % F.P
    assert F.R2 == (F.R * F.R) % F.P
    assert (F.NPRIME * F.P) % (1 << 32) == (1 << 32) - 1  # NPRIME = -P^-1
    assert pow(F.ROU_ORDER_27, 1 << 27, F.P) == 1
    assert pow(F.ROU_ORDER_27, 1 << 26, F.P) != 1
    assert F.ROU_ORDER_27 == 0x1A427A41  # canonical risc0 Baby Bear ROU
    for k in range(F.TWO_ADICITY + 1):
        assert (F.ROU_FWD[k] * F.ROU_REV[k]) % F.P == 1


def test_monty_roundtrip():
    x = rand_fp((1024,))
    m = F.to_monty(x)
    back = np.asarray(F.from_monty(m))
    np.testing.assert_array_equal(back, x)
    # to_monty(x) == x * 2^32 mod p
    expected = (x.astype(object) * (1 << 32)) % F.P
    np.testing.assert_array_equal(np.asarray(m).astype(object), expected)


def test_mul_golden():
    a = rand_fp((4096,))
    b = rand_fp((4096,))
    am = F.to_monty(a)
    bm = F.to_monty(b)
    got = np.asarray(F.from_monty(F.mul(am, bm)))
    expected = (a.astype(object) * b.astype(object)) % F.P
    np.testing.assert_array_equal(got.astype(object), expected)


def test_mul_edge_cases():
    edge = np.array([0, 1, 2, F.P - 1, F.P - 2, 1 << 27, 15 << 27, 0x7FFFFFFF % F.P],
                    dtype=np.uint32)
    a = np.repeat(edge, len(edge))
    b = np.tile(edge, len(edge))
    got = np.asarray(F.from_monty(F.mul(F.to_monty(a), F.to_monty(b))))
    expected = (a.astype(object) * b.astype(object)) % F.P
    np.testing.assert_array_equal(got.astype(object), expected)


def test_add_sub_neg():
    a = rand_fp((2048,))
    b = rand_fp((2048,))
    np.testing.assert_array_equal(
        np.asarray(F.add(a, b)).astype(object),
        (a.astype(object) + b) % F.P)
    np.testing.assert_array_equal(
        np.asarray(F.sub(a, b)).astype(object),
        (a.astype(object) - b) % F.P)
    np.testing.assert_array_equal(
        np.asarray(F.neg(a)).astype(object), (-a.astype(object)) % F.P)


def test_inv_pow():
    a = rand_fp((512,))
    a[0] = 1
    am = F.to_monty(a)
    prod = np.asarray(F.from_monty(F.mul(am, F.inv(am))))
    np.testing.assert_array_equal(prod, np.ones_like(a))
    # pow vs python pow
    e = 12345
    got = np.asarray(F.from_monty(F.pow_const(am, e)))
    expected = np.array([pow(int(x), e, F.P) for x in a], dtype=np.uint32)
    np.testing.assert_array_equal(got, expected)


def test_ext_mul_matches_host():
    a = rand_fp((256, 4))
    b = rand_fp((256, 4))
    got = np.asarray(F.from_monty(F.ext_mul(F.to_monty(a), F.to_monty(b))))
    expected = H.ext_mul(a, b).astype(np.uint32)
    np.testing.assert_array_equal(got, expected)


def test_ext_mul_associative_distributive_host():
    a = rand_fp((16, 4))
    b = rand_fp((16, 4))
    c = rand_fp((16, 4))
    lhs = H.ext_mul(H.ext_mul(a, b), c)
    rhs = H.ext_mul(a, H.ext_mul(b, c))
    np.testing.assert_array_equal(lhs, rhs)
    lhs2 = H.ext_mul(a, H.ext_add(b, c))
    rhs2 = H.ext_add(H.ext_mul(a, b), H.ext_mul(a, c))
    np.testing.assert_array_equal(lhs2, rhs2)


def test_ext_inv_device_and_host():
    a = rand_fp((64, 4))
    a[0] = [1, 0, 0, 0]
    am = F.to_monty(a)
    prod = np.asarray(F.from_monty(F.ext_mul(am, F.ext_inv(am))))
    one = np.zeros_like(a)
    one[:, 0] = 1
    np.testing.assert_array_equal(prod, one)
    hostprod = H.ext_mul(a, H.ext_inv(a))
    np.testing.assert_array_equal(hostprod.astype(np.uint32), one)


def test_ext_irreducibility_witness():
    # x^4 - 11 has no roots even in the field: 11 is not a quadratic residue
    assert pow(F.BETA, (F.P - 1) // 2, F.P) == F.P - 1


def test_host_batch_inv():
    a = rand_fp((97,))
    a[a == 0] = 1
    got = H.fbatch_inv(a)
    np.testing.assert_array_equal(H.fmul(got, a), np.ones_like(a, dtype=np.uint64))


def test_host_powers():
    w = H.rou_fwd(16)
    ps = H.powers(w, 16)
    assert ps[0] == 1
    assert (int(ps[15]) * w) % F.P == 1  # w^16 == 1
    ext_b = H.ext(np.array([1, 2, 3, 4], dtype=np.uint64))
    eps = H.ext_powers(ext_b, 5)
    np.testing.assert_array_equal(eps[2], H.ext_mul(ext_b, ext_b))
