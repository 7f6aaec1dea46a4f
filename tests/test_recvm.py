"""Recursion VM (write-once-memory straight-line AIR) unit tests.

Ladder: witgen equivalence (numpy vs C++) -> constraint oracle on hand
programs -> Poseidon blocks match the host hash functions -> STARK
prove/verify round trip -> tamper rejection (forged WOM values)."""

import numpy as np
import pytest

from zeth_tpu import hostmath as H
from zeth_tpu.field import P
from zeth_tpu.hash import poseidon2 as P2
from zeth_tpu.recursion import builder as B
from zeth_tpu.recursion import vm
from zeth_tpu.zkp.air import check_constraints


def _finish(b: B.Builder, stream=()):
    pr = b.build()
    air = vm.RecursionAir(pr)
    po2 = pr.po2()
    main, wom = vm._witgen_py(pr, np.asarray(stream, np.uint64), 1 << po2)
    return pr, air, po2, main, wom


def _check(air, po2, main):
    control = air.control_trace(po2)
    chal = np.array([[3, 5, 7, 11], [13, 17, 19, 23]], dtype=np.uint64)
    aux = air.build_aux(main, chal)
    bad = check_constraints(air, control, main, aux,
                            publics=[0] * vm.N_PUB, challenges=chal)
    assert bad == {}, f"constraint violations: {bad}"


def test_fma_and_wom():
    b = B.Builder()
    x = b.input()
    y = b.input()
    s = b.add(x, y)
    p = b.mul(x, y)
    t = b.fma(a=x, b=y, c=s, d=p, e=x, s0=2, s1=3, s2=4, imm=(1, 2, 3, 4))
    b.assert_eq(s, 12)
    pr, air, po2, main, wom = _finish(b, stream=[5, 7])
    assert tuple(wom[s]) == (12, 0, 0, 0)
    assert tuple(wom[p]) == (35, 0, 0, 0)
    want = H.ext_add(
        H.ext_add((H.ext(35) * np.uint64(2)) % H.PU,
                  (H.ext_mul(H.ext(12), H.ext(35)) * np.uint64(3)) % H.PU),
        H.ext_add((H.ext(5) * np.uint64(4)) % H.PU,
                  np.array([1, 2, 3, 4], np.uint64)))
    assert tuple(wom[t]) == tuple(want)
    _check(air, po2, main)


def test_witgen_native_matches_python():
    b = B.Builder()
    xs = b.inputs(6)
    acc = xs[0]
    for x in xs[1:]:
        acc = b.fma(a=acc, b=x, c=acc, d=b.ONE, s0=1, s1=5, imm=9)
    e = b.input_ext()
    iv = b.inv(e)
    bits = b.decompose(xs[3], 31)
    d8 = b.sponge_hash(xs + bits[:10])
    b.bind_public(d8[0], 0)
    pr = b.build()
    stream = np.arange(1, pr.n_stream + 1, dtype=np.uint64) * 12345 % P
    n = 1 << pr.po2()
    m_py, w_py = vm._witgen_py(pr, stream, n)
    from zeth_tpu.recursion import witgen_native
    m_c, w_c = witgen_native.run(pr, stream, n)
    assert (m_py == m_c).all()
    assert (w_py == w_c).all()


def test_sponge_matches_host_hash():
    b = B.Builder()
    vals = b.inputs(23)
    d = b.sponge_hash(vals)
    stream = (np.arange(23, dtype=np.uint64) * 7919 + 3) % P
    pr, air, po2, main, wom = _finish(b, stream=stream)
    want = P2.hash_rows_np(stream[None])[0]
    got = np.array([wom[c][0] for c in d], dtype=np.uint64)
    assert (got == want).all()
    _check(air, po2, main)


def test_pair_hash_and_select():
    rng = np.random.default_rng(1)
    l = rng.integers(0, P, 8, dtype=np.uint64)
    r = rng.integers(0, P, 8, dtype=np.uint64)
    for bit in (0, 1):
        b = B.Builder()
        lc = b.inputs(8)
        rc = b.inputs(8)
        bitc = b.bit_of(lc[0], 0)      # committed bit of l[0]
        d = b.pair_hash_sel(bitc, lc, rc)
        d2 = b.pair_hash(lc, rc)
        ll = l.copy()
        ll[0] = (ll[0] & ~np.uint64(1)) | np.uint64(bit)
        pr, air, po2, main, wom = _finish(b, stream=np.r_[ll, r])
        want_plain = P2.hash_pairs_np(ll[None], r[None])[0]
        want_sel = (P2.hash_pairs_np(r[None], ll[None])[0] if bit
                    else want_plain)
        got = np.array([wom[c][0] for c in d], dtype=np.uint64)
        got2 = np.array([wom[c][0] for c in d2], dtype=np.uint64)
        assert (got == want_sel).all()
        assert (got2 == want_plain).all()
        _check(air, po2, main)


def test_transcript_mirror_matches_host():
    from zeth_tpu.zkp.transcript import Transcript
    rng = np.random.default_rng(2)
    vals = rng.integers(0, P, 100, dtype=np.uint64)
    digest = rng.integers(0, P, 8, dtype=np.uint64)

    t = Transcript()
    t.mix_values(vals)
    t.mix(digest)
    want = [t.sample() for _ in range(20)]

    b = B.Builder()
    vc = b.inputs(100)
    dc = b.inputs(8)
    rt = B.RTranscript(b)
    rt.mix_values(vc)
    rt.mix_digest(dc)
    sc = rt.sample_vec(20)
    pr, air, po2, main, wom = _finish(b, stream=np.r_[vals, digest])
    got = [int(wom[c][0]) for c in sc]
    assert got == want
    _check(air, po2, main)


def test_decompose_rejects_noncanonical():
    # decompose emits canonicity + sum binding; forging a bit breaks them
    b = B.Builder()
    x = b.input()
    bits = b.decompose(x, 31)
    pr, air, po2, main, wom = _finish(b, stream=[22])
    _check(air, po2, main)
    # forge: flip a committed bit value in the main trace
    row = None
    for r in range(pr.n_rows):
        if pr.typ[r] == vm.T_BIT:
            row = r
            break
    forged = main.copy()
    forged[row, vm.ML.VAL + 4 * 5] ^= 1
    control = air.control_trace(po2)
    chal = np.array([[3, 5, 7, 11], [13, 17, 19, 23]], dtype=np.uint64)
    aux = air.build_aux(forged, chal)
    bad = check_constraints(air, control, forged, aux,
                            publics=[0] * vm.N_PUB, challenges=chal)
    assert bad, "forged bit not caught"


@pytest.mark.slow
def test_prove_verify_roundtrip():
    from zeth_tpu.zkp import prover, verifier
    b = B.Builder()
    x = b.input()
    y = b.input()
    s = b.add(x, y)
    d = b.sponge_hash([x, y, s])
    for j in range(8):
        b.bind_public(d[j], j)
    pr = b.build()
    air = vm.RecursionAir(pr)
    po2 = max(pr.po2(), 6)
    stream = np.array([101, 202], dtype=np.uint64)
    main, wom = air.witgen(stream, po2)
    pubs = [int(wom[c][0]) for c in d]
    proof = prover.prove(air, main, pubs)
    verifier.verify(air, proof, pubs)
    # tamper: a different claimed public digest must fail
    bad = list(pubs)
    bad[0] = (bad[0] + 1) % P
    with pytest.raises(verifier.VerificationError):
        verifier.verify(air, proof, bad)
    # tamper: forged WOM value with fixed-up LogUp must still fail
    forged = main.copy()
    frow = next(r for r in range(pr.n_rows) if pr.typ[r] == vm.T_FMA
                and pr.mult[r][5] != 0)
    forged[frow, vm.ML.VAL + 4 * 5] = (forged[frow, vm.ML.VAL + 4 * 5] + 1) % P
    with pytest.raises(verifier.VerificationError):
        proof2 = prover.prove(air, forged, pubs)
        verifier.verify(air, proof2, pubs)
