"""NTT layer tests: roundtrip, O(n^2) DFT oracle, coset LDE consistency."""

import numpy as np

import jax

from zeth_tpu import field as F
from zeth_tpu import hostmath as H
from zeth_tpu import ntt as N

RNG = np.random.default_rng(7)


def rand_fp(shape):
    return RNG.integers(0, F.P, size=shape, dtype=np.uint32)


def host_dft(coeffs, w, shift=1):
    """O(n^2) evaluation oracle: out[i] = sum_j c_j * (shift * w^i)^j."""
    n = len(coeffs)
    out = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        x = (shift * pow(w, i, F.P)) % F.P
        acc = 0
        for j in range(n - 1, -1, -1):
            acc = (acc * x + int(coeffs[j])) % F.P
        out[i] = acc
    return out


def test_ntt_matches_dft_oracle():
    n = 16
    c = rand_fp((n,))
    got = np.asarray(F.from_monty(N.ntt_jit(F.to_monty(c[:, None]))))[:, 0]
    want = host_dft(c, F.rou_fwd(n))
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_ntt_intt_roundtrip_batched():
    n = 256
    x = F.to_monty(rand_fp((n, 8)))
    back = N.intt_jit(N.ntt_jit(x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_coset_lde_consistent_with_poly():
    n = 32
    blowup = 4
    vals = rand_fp((n, 3))
    lde = np.asarray(F.from_monty(
        N.coset_lde_jit(F.to_monty(vals), blowup=blowup)))
    # ground truth: interpolate on the subgroup, evaluate on the coset
    coeffs_m = N.intt_jit(F.to_monty(vals))
    coeffs = np.asarray(F.from_monty(coeffs_m))
    for col in range(3):
        want = host_dft(
            np.concatenate([coeffs[:, col], np.zeros(n * (blowup - 1), np.uint32)]),
            F.rou_fwd(blowup * n), shift=F.GENERATOR)
        np.testing.assert_array_equal(lde[:, col].astype(np.uint64), want)


def test_lde_degree_bound():
    # LDE of degree < n data stays degree < n: iNTT of the big domain has
    # zero high coefficients (after unshifting).
    n = 16
    blowup = 4
    vals = F.to_monty(rand_fp((n, 2)))
    lde = N.coset_lde_jit(vals, blowup=blowup)
    big_coeffs = np.asarray(F.from_monty(N.intt_jit(lde))).astype(np.uint64)
    # unshift: c_i * shift^i are the shifted coeffs; high ones must be 0
    assert np.all(big_coeffs[n:] == 0)


def test_modsum():
    x = rand_fp((1000, 5))
    got = np.asarray(N.modsum(x, axis=0)).astype(object)
    want = x.astype(object).sum(axis=0) % F.P
    np.testing.assert_array_equal(got, want)


def test_eval_poly_ext_matches_host():
    n = 64
    c = rand_fp((n, 2))
    z = H.ext(np.array([3, 1, 4, 1], dtype=np.uint64))
    zp = H.ext_powers(z, n)  # (n, 4) standard
    got = np.asarray(F.from_monty(
        N.eval_poly_ext(F.to_monty(c), F.to_monty(zp.astype(np.uint32)))))
    # host: sum c_j * z^j
    want = np.zeros((2, 4), dtype=np.uint64)
    for col in range(2):
        acc = H.ext(0)
        for j in range(n):
            acc = H.ext_add(acc, H.ext_mul(H.ext(int(c[j, col])), zp[j]))
        want[col] = acc
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_coset_points():
    pts = N.coset_points(8)
    assert pts[0] == F.GENERATOR
    w = F.rou_fwd(8)
    assert pts[3] == (F.GENERATOR * pow(w, 3, F.P)) % F.P
