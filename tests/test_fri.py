"""FRI prove/verify roundtrip: device commit/fold vs host verification."""

import numpy as np
import jax.numpy as jnp
import pytest

from zeth_tpu import field as F, hostmath as H, ntt
from zeth_tpu.field import P
from zeth_tpu.zkp import fri
from zeth_tpu.zkp.transcript import Transcript

rng = np.random.default_rng(23)
SHIFT = 31


def _to_monty(a):
    return ((np.asarray(a, np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def _random_poly_evals(degree):
    """Random ext poly of given degree -> (coeffs, device evals on coset)."""
    coeffs = rng.integers(0, P, size=(degree, 4), dtype=np.uint64)
    n0 = degree * fri.BLOWUP
    # evaluate via coset NTT: pad coeffs, scale by shift powers, NTT
    shift_pows = H.powers(SHIFT, degree)
    scaled = (coeffs * shift_pows[:, None]) % H.PU
    padded = np.zeros((n0, 4), dtype=np.uint64)
    padded[:degree] = scaled
    evals = ntt.ntt(jnp.asarray(_to_monty(padded)))
    return coeffs, evals


def _host_eval(coeffs, x):
    xp = H.powers(x, coeffs.shape[0])
    acc = np.zeros(4, dtype=np.uint64)
    for j in range(coeffs.shape[0]):
        acc = H.ext_add(acc, (coeffs[j] * xp[j]) % H.PU)
    return acc


def _inner_from_coeffs(coeffs, n0):
    def inner(q):
        x = SHIFT * pow(H.rou_fwd(n0), q, P) % P
        return _host_eval(coeffs, x)
    return inner


def test_fri_roundtrip_with_folds():
    degree = 4096  # one fold: 4096 -> 256
    coeffs, evals = _random_poly_evals(degree)
    proof, qs = fri.prove(evals, SHIFT, degree, Transcript())
    assert len(proof.layer_roots) == 1
    assert proof.final_coeffs.shape == (256, 4)
    assert len(qs) == fri.QUERIES
    got_qs = fri.verify(proof, degree, SHIFT, Transcript(),
                        _inner_from_coeffs(coeffs, degree * fri.BLOWUP))
    assert got_qs == qs


def test_fri_roundtrip_no_folds():
    degree = 256
    coeffs, evals = _random_poly_evals(degree)
    proof, qs = fri.prove(evals, SHIFT, degree, Transcript())
    assert proof.layer_roots == []
    fri.verify(proof, degree, SHIFT, Transcript(),
               _inner_from_coeffs(coeffs, degree * fri.BLOWUP))


def test_fri_rejects_wrong_inner_value():
    degree = 4096
    coeffs, evals = _random_poly_evals(degree)
    proof, qs = fri.prove(evals, SHIFT, degree, Transcript())
    bad = coeffs.copy()
    bad[0, 0] = (bad[0, 0] + 1) % P
    with pytest.raises(ValueError):
        fri.verify(proof, degree, SHIFT, Transcript(),
                   _inner_from_coeffs(bad, degree * fri.BLOWUP))


def test_fri_rejects_tampered_final_poly():
    degree = 4096
    coeffs, evals = _random_poly_evals(degree)
    proof, _ = fri.prove(evals, SHIFT, degree, Transcript())
    proof.final_coeffs = proof.final_coeffs.copy()
    proof.final_coeffs[3, 1] = (proof.final_coeffs[3, 1] + 1) % P
    with pytest.raises(ValueError):
        fri.verify(proof, degree, SHIFT, Transcript(),
                   _inner_from_coeffs(coeffs, degree * fri.BLOWUP))


def test_fri_rejects_exceeded_degree():
    # a polynomial of degree >= bound must be caught at prove time
    degree = 4096
    coeffs = rng.integers(0, P, size=(degree + 1, 4), dtype=np.uint64)
    n0 = degree * fri.BLOWUP
    shift_pows = H.powers(SHIFT, degree + 1)
    scaled = (coeffs * shift_pows[:, None]) % H.PU
    padded = np.zeros((n0, 4), dtype=np.uint64)
    padded[:degree + 1] = scaled
    evals = ntt.ntt(jnp.asarray(_to_monty(padded)))
    with pytest.raises(AssertionError):
        fri.prove(evals, SHIFT, degree, Transcript())
