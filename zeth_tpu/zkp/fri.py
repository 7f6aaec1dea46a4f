"""FRI low-degree proof: device commit/fold, host verify.

Replaces the FRI engine of risc0-zkp 3.0.2 with the same parameters
(SURVEY.md §2.2: blowup/INV_RATE = 4, fold factor 16, 50 queries,
final-degree cutoff 256). PROTOCOL.md §7 documents the layer layout.

TPU-native design: each fold round is one jitted program — a batched
16-point iNTT over the group axis (reusing the radix-2 NTT stages) fused
with the per-position phi/x0 power scaling; each layer commit is one
batched Merkle build. The query phase touches ~50 rows and runs on host.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .. import field as F
from .. import hostmath as H
from .. import ntt
from ..field import P
from ..hash import merkle
from .transcript import Transcript

FRI_FOLD = 16
BLOWUP = 4
QUERIES = 50
FRI_MIN_DEGREE = 256
POW_BITS = 20       # Fiat-Shamir grinding before query sampling

_U32 = jnp.uint32


def _to_monty_np(a) -> np.ndarray:
    return ((np.asarray(a, np.uint64) << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


def group_matrix(evals):
    """(N, 4) ext evals -> (N/16, 64) rows; row g = positions {g + k*N/16}."""
    n = evals.shape[0]
    m = n // FRI_FOLD
    return jnp.swapaxes(evals.reshape(FRI_FOLD, m, 4), 0, 1).reshape(m, FRI_FOLD * 4)


@partial(jax.jit, static_argnames=())
def fold16(evals, phi_monty, inv_x0_monty):
    """One FRI fold. evals: (N, 4) Montgomery; phi: (4,); inv_x0: (N/16,).

    f(x) = sum_j x^j g_j(x^16); output f'(y_g) = sum_j (phi/x0_g)^j u_j(g)
    where u = iNTT_16 over the within-group axis and x0_g = h*w_N^g.
    """
    n = evals.shape[0]
    m = n // FRI_FOLD
    grouped = evals.reshape(FRI_FOLD, m, 4)
    u = ntt.intt(grouped)                              # (16, m, 4)
    s = F.ext_mul_base(jnp.broadcast_to(phi_monty, (m, 4)), inv_x0_monty)

    def body(carry, uj):
        out, powj = carry
        out = F.ext_add(out, F.ext_mul(uj, powj))
        powj = F.ext_mul(powj, s)
        return (out, powj), None

    (out, _), _ = jax.lax.scan(body, (u[0], s), u[1:])
    return out


@dataclass
class FriLayerOpening:
    row: np.ndarray     # (64,) standard-form base values of the group row
    path: np.ndarray    # (depth, 8) sibling digests


@dataclass
class FriProof:
    layer_roots: list       # list of (8,) digests
    final_coeffs: np.ndarray  # (d, 4) ext coefficients, standard form
    openings: list = dfield(default_factory=list)  # [query][layer] -> FriLayerOpening
    pow_nonce: int = 0      # grinding nonce (POW_BITS)


@jax.jit
def _gather_layers(mats, layer_tuples, gl_idx, idx_mats):
    """Queried group rows + sibling digests of EVERY FRI layer in one
    program (one device round-trip instead of two per layer — the
    tunneled chip's dispatch latency dominated the opening phase)."""
    rows = tuple(F.from_monty(mat[gl]) for mat, gl in zip(mats, gl_idx))
    sibs = tuple(
        tuple(F.from_monty(layer[idx_mat[d]])
              for d, layer in enumerate(reversed(list(layers)[1:])))
        for layers, idx_mat in zip(layer_tuples, idx_mats))
    return rows, sibs


def _open_all_layers(layers, pos_per_layer):
    """Rows + sibling paths for all queries on all layers, batched."""
    mats, gl_idx, idx_mats, depths = [], [], [], []
    for (tree, lay, _, _), gl in zip(layers, pos_per_layer):
        mats.append(group_matrix(lay))
        gl_idx.append(jnp.asarray(np.array(gl, np.int32)))
        depth = len(tree.layers) - 1
        depths.append(depth)
        idx_rows = []
        idxs = list(gl)
        for _ in range(depth):
            idx_rows.append([i ^ 1 for i in idxs])
            idxs = [i >> 1 for i in idxs]
        idx_mats.append(jnp.asarray(np.array(idx_rows, np.int32))
                        if depth else jnp.zeros((0, len(gl)), jnp.int32))
    rows_t, sibs_t = jax.device_get(_gather_layers(
        tuple(mats), tuple(tuple(t.layers) for (t, _, _, _) in layers),
        tuple(gl_idx), tuple(idx_mats)))
    rows_per_layer = [np.asarray(r, np.uint64) for r in rows_t]
    paths_per_layer = []
    for li, depth in enumerate(depths):
        sib_layers = [np.asarray(s, np.uint64) for s in sibs_t[li]]
        nq = rows_per_layer[li].shape[0]
        paths_per_layer.append(
            [np.stack([sib_layers[d][qi] for d in range(depth)])
             if depth else np.zeros((0, 8), np.uint64) for qi in range(nq)])
    return rows_per_layer, paths_per_layer


def _inv_x0_table(shift: int, n: int) -> np.ndarray:
    """Montgomery table of (shift * w_n^g)^-1 for g < n/16."""
    m = n // FRI_FOLD
    s_inv = pow(int(shift), P - 2, P)
    tab = H.powers(H.rou_rev(n), m) * np.uint64(s_inv) % np.uint64(P)
    return _to_monty_np(tab)


def prove(evals, shift: int, degree: int, transcript: Transcript):
    """FRI commit + query phase.

    evals: (degree*BLOWUP, 4) Montgomery device array — evaluations of a
    degree-<`degree` ext polynomial on the coset shift*<w_N>.
    Returns (FriProof, query_indices); the caller must open its own trace
    commitments at the same query indices.
    """
    n0 = evals.shape[0]
    assert n0 == degree * BLOWUP and n0 % FRI_FOLD == 0

    from .prover import _Stage

    layers = []   # (tree, evals, domain_size, shift)
    cur, cur_shift, deg = evals, int(shift), int(degree)
    while deg > FRI_MIN_DEGREE:
        with _Stage(f"  fri commit deg=2^{deg.bit_length() - 1}"):
            tree = merkle.commit_rows(group_matrix(cur))
            transcript.mix(tree.root)
        phi = transcript.sample_ext()
        layers.append((tree, cur, cur.shape[0], cur_shift))
        with _Stage("  fri fold"):
            inv_x0 = jnp.asarray(_inv_x0_table(cur_shift, cur.shape[0]))
            cur = fold16(cur, jnp.asarray(_to_monty_np(phi)), inv_x0)
        cur_shift = pow(cur_shift, FRI_FOLD, P)
        deg //= FRI_FOLD

    # Final polynomial: iNTT over the last domain, remove the coset shift.
    with _Stage("  fri final poly"):
        coeffs = np.asarray(F.from_monty(ntt.intt(cur))).astype(np.uint64)
        s_inv_pows = H.powers(pow(cur_shift, P - 2, P), coeffs.shape[0])
        coeffs = (coeffs * s_inv_pows[:, None]) % np.uint64(P)
        assert (coeffs[deg:] == 0).all(), \
            "final FRI polynomial exceeds degree bound"
        final_coeffs = coeffs[:deg].copy()
        transcript.mix_values(final_coeffs.reshape(-1))

    # PoW grinding, then queries
    with _Stage("  fri grind"):
        nonce = transcript.grind(POW_BITS)
    qs = [transcript.sample_index(n0) for _ in range(QUERIES)]
    proof = FriProof(
        layer_roots=[t.root for (t, _, _, _) in layers],
        final_coeffs=final_coeffs,
        pow_nonce=nonce,
    )
    # per-layer positions for every query, then one device gather per layer
    pos_per_layer = []       # [layer][query] -> g
    cur_pos = list(qs)
    for (_, _, n_l, _) in layers:
        m = n_l // FRI_FOLD
        cur_pos = [p % m for p in cur_pos]
        pos_per_layer.append(list(cur_pos))
    with _Stage("  fri openings"):
        rows_per_layer, paths_per_layer = _open_all_layers(
            layers, pos_per_layer)
    for qi in range(len(qs)):
        per_layer = []
        for li in range(len(layers)):
            per_layer.append(FriLayerOpening(
                row=rows_per_layer[li][qi], path=paths_per_layer[li][qi]))
        proof.openings.append(per_layer)
    return proof, qs


# ---------------------------------------------------------------------------
# Host verification
# ---------------------------------------------------------------------------


def _intt16_np(vals_ext: np.ndarray) -> np.ndarray:
    """Host 16-point ext iNTT (vals: (16, 4) standard form)."""
    w_inv = H.rou_rev(FRI_FOLD)
    out = np.zeros((FRI_FOLD, 4), dtype=np.uint64)
    for j in range(FRI_FOLD):
        acc = np.zeros(4, dtype=np.uint64)
        wj = H.powers(pow(w_inv, j, P), FRI_FOLD)
        for k in range(FRI_FOLD):
            acc = H.ext_add(acc, (vals_ext[k].astype(np.uint64) * wj[k]) % H.PU)
        out[j] = (acc * np.uint64(pow(FRI_FOLD, P - 2, P))) % H.PU
    return out


def verify(proof: FriProof, degree: int, shift: int, transcript: Transcript,
           inner) -> list[int]:
    """Replay the FRI transcript and check all query chains.

    inner(q) -> (4,) standard-form ext value of the committed polynomial at
    domain index q (computed by the caller from its own trace openings).
    Returns the query indices. Raises ValueError on any failure.
    """
    n0 = degree * BLOWUP
    # replay commit phase
    phis = []
    domains = []
    deg, cur_shift, n_l = int(degree), int(shift), n0
    li = 0
    while deg > FRI_MIN_DEGREE:
        transcript.mix(proof.layer_roots[li])
        phis.append(transcript.sample_ext())
        domains.append((n_l, cur_shift))
        cur_shift = pow(cur_shift, FRI_FOLD, P)
        n_l //= FRI_FOLD
        deg //= FRI_FOLD
        li += 1
    if li != len(proof.layer_roots):
        raise ValueError("fri: layer count mismatch")
    if proof.final_coeffs.shape[0] != deg:
        raise ValueError("fri: final degree mismatch")
    if proof.final_coeffs.ndim != 2 or proof.final_coeffs.shape[1] != 4:
        raise ValueError("fri: final coeff shape")
    transcript.mix_values(np.asarray(proof.final_coeffs, np.uint64).reshape(-1))
    if not transcript.check_grind(POW_BITS, proof.pow_nonce):
        raise ValueError("fri: proof-of-work grinding check failed")
    qs = [transcript.sample_index(n0) for _ in range(QUERIES)]
    if len(proof.openings) != len(qs):
        raise ValueError("fri: opening count mismatch")

    # batched Merkle verification: all queries per layer at once
    for ell in range(len(domains)):
        n_l = domains[ell][0]
        m = n_l // FRI_FOLD
        gl, rows_l, paths_l = [], [], []
        for qi, q in enumerate(qs):
            if len(proof.openings[qi]) != len(domains):
                raise ValueError("fri: layer opening count mismatch")
            pos = q
            for e2 in range(ell):
                pos = pos % (domains[e2][0] // FRI_FOLD)
            gl.append(pos % m)
            rows_l.append(np.asarray(proof.openings[qi][ell].row))
            paths_l.append(proof.openings[qi][ell].path)
        if not merkle.verify_many(proof.layer_roots[ell], gl, rows_l,
                                  paths_l, depth=m.bit_length() - 1,
                                  width=FRI_FOLD * 4):
            raise ValueError(f"fri: bad merkle path (layer {ell})")

    for qi, q in enumerate(qs):
        pos = q
        value = np.asarray(inner(q), dtype=np.uint64)
        if len(proof.openings[qi]) != len(domains):
            raise ValueError("fri: layer opening count mismatch")
        for ell, ((n_l, h_l), phi) in enumerate(zip(domains, phis)):
            opening = proof.openings[qi][ell]
            m = n_l // FRI_FOLD
            g = pos % m
            k = pos // m
            vals = opening.row.reshape(FRI_FOLD, 4)
            if not (vals[k] == value).all():
                raise ValueError(f"fri: layer value mismatch (query {qi} layer {ell})")
            u = _intt16_np(vals)
            x0 = int(h_l) * pow(H.rou_fwd(n_l), g, P) % P
            s = H.ext_mul(phi, H.ext(pow(x0, P - 2, P)))
            acc = u[0]
            powj = s
            for j in range(1, FRI_FOLD):
                acc = H.ext_add(acc, H.ext_mul(u[j], powj))
                if j + 1 < FRI_FOLD:
                    powj = H.ext_mul(powj, s)
            value = acc
            pos = g
        # final polynomial evaluation at the remaining position
        n_fin, h_fin = (domains[-1][0] // FRI_FOLD,
                        pow(domains[-1][1], FRI_FOLD, P)) if domains else (n0, shift)
        x = int(h_fin) * pow(H.rou_fwd(n_fin), pos, P) % P
        xp = H.powers(x, proof.final_coeffs.shape[0])
        want = np.zeros(4, dtype=np.uint64)
        for j in range(proof.final_coeffs.shape[0]):
            want = H.ext_add(want, (proof.final_coeffs[j] * xp[j]) % H.PU)
        if not (want == value).all():
            raise ValueError(f"fri: final polynomial mismatch (query {qi})")
    return qs
