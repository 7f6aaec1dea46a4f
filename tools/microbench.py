"""Microbenchmarks of isolated prover stages on the attached chip.

Reports steady-state wall time per stage so kernel work targets real
costs (bench.py interleaves the paging companion proof, which muddies
per-stage numbers). device_get forces completion — block_until_ready
on the tunneled axon backend returns before execution finishes."""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from zeth_tpu import field as F


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    if isinstance(leaf, np.ndarray):
        return leaf
    idx = tuple([-1] * leaf.ndim)
    return jax.device_get(leaf[idx])


def timeit(name, fn, reps=2):
    out = fn()
    _force(out)
    del out
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        _force(out)
        best = min(best, time.time() - t0)
        del out
    gc.collect()
    print(f"{name}: {best * 1e3:.1f} ms", flush=True)
    return best


def main():
    po2 = int(os.environ.get("MB_PO2", "18"))
    n = 1 << po2
    c = int(os.environ.get("MB_COLS", "1009"))
    rng = np.random.default_rng(0)
    print(f"-- n=2^{po2} rows, {c} cols --", flush=True)

    from zeth_tpu import mxu
    from zeth_tpu.hash import merkle
    from zeth_tpu.hash import poseidon2 as P2
    from zeth_tpu.zkp import prover

    trace = jnp.asarray(rng.integers(0, F.P, size=(n, c), dtype=np.uint32))
    _force(trace)

    which = os.environ.get("MB_ONLY", "")

    def want(tag):
        return not which or tag in which.split(",")

    if want("lde"):
        timeit("lde radix2 chunked", lambda: prover._lde_chunked_monty(trace))
        if n >= mxu.FS_MIN_ROWS and po2 < 19:
            timeit("lde mxu four-step", lambda: mxu.coset_lde_fs(trace))

    lde = prover._lde_chunked_monty(trace)
    _force(lde)

    if want("hash"):
        def leaf_xla():
            if lde.size > P2.STREAM_HASH_ELEMS:
                return P2.hash_rows_large(lde)
            return P2.hash_rows(lde)
        timeit("merkle leaf hash (XLA)", leaf_xla)
        leaves = leaf_xla()
        _force(leaves)
        timeit("merkle pair-tree levels",
               lambda: merkle.commit_digests(leaves).root)
        del leaves

    if want("taps"):
        w = jnp.asarray(rng.integers(0, F.P, size=(n, 8), dtype=np.uint32))
        chunk = min(4096, n)
        timeit("taps reduce scan (1 grp)",
               lambda: prover._eval_rows_ext_s4(lde, w, chunk))
        timeit("taps reduce mxu (1 grp)",
               lambda: mxu.modmm_tn(lde[::4], w))
        del w

    if want("deep"):
        bp = jnp.asarray(rng.integers(0, F.P, size=(c, 4), dtype=np.uint32))
        timeit("deep mix scan (1 grp)",
               lambda: prover._deep_mix_s4((lde,), (bp,),
                                           min(n // 4, 2048), 1))
        timeit("deep mix mxu (1 grp)", lambda: mxu.modmm(lde[::4], bp))
        del bp

    if want("tape"):
        from zeth_tpu.circuits import rv32im as rv
        from zeth_tpu.zkp import tape
        air = rv.Rv32imAir(np.zeros(1, np.uint32), np.zeros(1, np.uint32))
        prover.register_air(air)
        n_pub = air.n_public_scalars
        tp = prover._tape_program(air.name, n_pub)
        ldes = {
            "control": jnp.asarray(rng.integers(
                0, F.P, size=(4 * n, air.control_cols), dtype=np.uint32)),
            "main": lde,
            "aux": jnp.asarray(rng.integers(
                0, F.P, size=(4 * n, air.aux_cols), dtype=np.uint32)),
        }
        pubs = [0] * n_pub
        chal = np.ones((air.n_challenges + air.n_derived, 4), np.uint64)
        alpha = np.ones((tp.n_stage, 4), np.uint64)
        timeit("tape eval_check (rv32im)",
               lambda: tape.eval_check(tp, ldes, pubs, chal, alpha))
        del ldes

    if want("fri"):
        from zeth_tpu.zkp import fri
        evals = jnp.asarray(rng.integers(0, F.P, size=(4 * n, 4),
                                         dtype=np.uint32))
        phi = jnp.asarray(np.ones(4, np.uint32))
        inv_x0 = jnp.asarray(rng.integers(0, F.P, size=(n // 4,),
                                          dtype=np.uint32))
        timeit("fri fold16 (4n)", lambda: fri.fold16(evals, phi, inv_x0))
        timeit("fri group+commit (4n)",
               lambda: merkle.commit_rows(fri.group_matrix(evals)).root)
        del evals

    if want("upload"):
        host32 = np.asarray(rng.integers(0, F.P, size=(n, 32),
                                         dtype=np.uint32))
        timeit("upload u32 (n x 32 = %dMB)" % (host32.nbytes >> 20),
               lambda: _force(jnp.asarray(host32)))


if __name__ == "__main__":
    sys.exit(main())
