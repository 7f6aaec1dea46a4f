"""Benchmark: single-segment STARK proving throughput on the attached chip.

BASELINE.json config 2: Baby Bear LDE + Poseidon2 Merkle commit + DEEP +
FRI for one rv32im segment. The reference publishes no absolute numbers
(BASELINE.md), so vs_baseline reports against the previous recorded run
when available (BENCH_PREV env or 1.0).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Also measured (folded into the "unit" string): the REAL workload — one
stateless-client (EVM) segment of the committed fixture block, proved
and cryptographically verified (BENCH_EVM=0 to skip) — and one
recursion lift of the segment proof (BENCH_LIFT=0 to skip), the
per-block marginal cost of the reference's lift/join aggregation.

Env knobs: BENCH_PO2 (default 18 — round-5 steady state ~9.2-9.7s per
segment pair, ~0.027 Mc/s/chip; po2=19/20 run through the chunked /
coset-streamed paths), BENCH_REPS, BENCH_PLATFORM (default: jax
default — the attached TPU under the driver; set cpu for local smoke).
XLA programs are persisted in .jax_cache at the repo root, so a prior
warm-up run (any process on this machine) amortizes the one-time
compile; the compile-vs-steady-state split is reported in "unit".
"""

import json
import os
import sys
import time


def main():
    po2 = int(os.environ.get("BENCH_PO2", "18"))
    if os.environ.get("BENCH_PLATFORM"):
        os.environ["JAX_PLATFORMS"] = os.environ["BENCH_PLATFORM"]

    import jax
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        # TPU-only: cache entries written against the axon host segfault
        # when loaded by the local CPU backend
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import hashlib

    import numpy as np

    from zeth_tpu.circuits import rv32im as rv
    from zeth_tpu.executor import (Executor, compute_image_id, guests,
                                   load_image)
    from zeth_tpu.zkvm import ReceiptClaim

    # fill the segment to just under the budget so ONE halting segment
    # carries ~2^po2 cycles (the chain verifier needs the final segment);
    # spin's loop executes ~2/3 of the requested cycle count
    elf = guests.spin(((1 << po2) - 4096) * 3 // 2)
    entry, ia, iw = load_image(elf)
    res = Executor(elf, segment_po2=po2, trace=True).run()
    assert len(res.segments) == 1
    seg = res.segments[0]
    cycles = seg.trace.shape[0]

    # warm-up run (compile), then timed runs — bounded by a wall budget
    # so the driver always receives a JSON line even on a cold cache.
    # prove_segment = the FULL per-segment pipeline: the rv32im STARK
    # plus its companion paging proof (memory page-tree commitment).
    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    start = time.time()
    t0 = time.time()
    seal, pg_seal = rv.prove_segment(seg, ia, iw)
    compile_s = time.time() - t0

    times = [compile_s]
    for _ in range(int(os.environ.get("BENCH_REPS", "2"))):
        if time.time() - start > budget:
            break
        t0 = time.time()
        seal, pg_seal = rv.prove_segment(seg, ia, iw)
        times.append(time.time() - t0)
    prove_s = min(times)

    # correctness gate for the number: full verification incl. paging
    claim = ReceiptClaim(
        image_id=compute_image_id(elf),
        journal_digest=hashlib.sha256(res.journal).digest(),
        exit_code=0)
    rv.verify_segments([seal], [pg_seal], claim, ia, iw, entry)
    seal_words = int(seal.shape[0]) + int(pg_seal.shape[0])

    # ---- the real workload: one stateless-client (EVM) segment --------
    # (BASELINE.md north star is EVM Mcycles/s/chip; spin flatters —
    # an EVM segment pays RAM-argument aux, paging companions and
    # accelerator-bound IO per cycle)
    evm_note = "evm=skipped"
    if os.environ.get("BENCH_EVM", "1") == "1" \
            and time.time() - start < budget * 0.5:
        try:
            evm_note = _bench_evm_segment(po2,
                                          budget - (time.time() - start))
        except Exception as e:                      # never lose the headline
            evm_note = f"evm=error({type(e).__name__})"

    # ---- recursion: lift one segment proof on the chip ----------------
    lift_note = "lift=skipped"
    if os.environ.get("BENCH_LIFT", "1") == "1" \
            and time.time() - start < budget * 0.6:
        try:
            lift_note = _bench_lift(seal, pg_seal, ia, iw)
        except Exception as e:
            lift_note = f"lift=error({type(e).__name__})"

    mcps = cycles / prove_s / 1e6
    prev = float(os.environ.get("BENCH_PREV", "0") or 0)
    out = {
        "metric": "rv32im_Mcycles_proved_per_sec_chip",
        "value": round(mcps, 4),
        "unit": f"Mcycles/s/chip (po2={po2}, {cycles} cycles, "
                f"prove {prove_s:.2f}s, first-run-incl-compile "
                f"{compile_s:.1f}s, seal {seal_words * 4 // 1024}KiB, "
                f"verified; {evm_note}; {lift_note})",
        "vs_baseline": round(mcps / prev, 3) if prev else 1.0,
    }
    print(json.dumps(out))


def _bench_evm_segment(po2: int, budget_left: float) -> str:
    """Prove + verify the FIRST segment of the stateless-client guest
    validating the committed Cancun fixture block; returns the EVM
    Mcycles/s/chip note for the unit string."""
    import glob
    import json as _json
    import time

    import numpy as np

    from zeth_tpu.app.chainspec import MAINNET
    from zeth_tpu.app.guest_input import (build_stateless_elf,
                                          encode_guest_input)
    from zeth_tpu.app.host import StatelessInput
    from zeth_tpu.circuits import rv32im as rv
    from zeth_tpu.circuits.paging import PagingAir
    from zeth_tpu.executor import Executor, load_image
    from zeth_tpu.zkp import proof as proof_mod
    from zeth_tpu.zkp import verifier as verifier_mod

    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "fixtures")
    paths = sorted(glob.glob(os.path.join(fixdir, "input_0x*.json")),
                   key=os.path.getsize)
    if not paths:
        return "evm=no-fixture"
    with open(paths[0]) as f:
        inp = StatelessInput.from_json(_json.load(f))
    elf = build_stateless_elf()
    entry, ia, iw = load_image(elf)
    raw = encode_guest_input(inp, MAINNET.chain_id)
    res = Executor(elf, input_bytes=raw, segment_po2=po2, trace=True).run()
    seg = res.segments[0]
    cycles = seg.trace.shape[0]
    t0 = time.time()
    seals, pg_seals = rv.prove_segments([seg], ia, iw)
    first = time.time() - t0
    prove_s = first
    if time.time() - t0 < budget_left * 0.5:
        t0 = time.time()
        seals, pg_seals = rv.prove_segments([seg], ia, iw)
        prove_s = min(prove_s, time.time() - t0)
    # cryptographic verification of the segment pair (the chain checks
    # need every segment; the bench proves only the first)
    proof = proof_mod.decode(seals[0])
    pg_proof = proof_mod.decode(pg_seals[0])
    ppg = PagingAir.parse_publics([int(p) for p in pg_proof.publics])
    verifier_mod.verify(PagingAir(), pg_proof,
                        [int(p) for p in pg_proof.publics])
    air = rv.Rv32imAir(ia, iw)
    sampled = verifier_mod.verify(
        air, proof, [int(p) for p in proof.publics],
        derived_extra={"d0": ppg["d0"], "d1": ppg["d1"]},
        extra_mix=pg_proof.roots["main"])
    assert (np.asarray(sampled[4], np.uint64) == ppg["g4"]).all()
    return (f"evm={cycles / prove_s / 1e6:.4f} Mc/s "
            f"({res.segments and len(res.segments)} segs total, "
            f"seg0 {cycles} cycles, prove {prove_s:.2f}s incl "
            f"first {first:.1f}s, verified)")


def _bench_lift(seal, pg_seal, ia, iw) -> str:
    """Time ONE recursion lift of the spin segment proof (the per-block
    marginal cost of the reference's lift/join aggregation)."""
    import time

    import numpy as np

    from zeth_tpu.circuits.paging import PagingAir
    from zeth_tpu.circuits.rv32im import Rv32imAir
    from zeth_tpu.recursion import succinct
    from zeth_tpu.zkp import proof as proof_mod

    air = Rv32imAir(ia, iw)
    proof = proof_mod.decode(seal)
    pg_proof = proof_mod.decode(pg_seal)
    ppg = PagingAir.parse_publics([int(p) for p in pg_proof.publics])
    extra = (np.asarray(pg_proof.roots["main"], np.uint64),
             ppg["d0"], ppg["d1"], ppg["g4"], ppg["g5"])
    t0 = time.time()
    rec = succinct.lift(air, proof, extra=extra)
    lift_s = time.time() - t0
    assert rec.proof is not None
    return f"lift(po2={proof.po2})={lift_s:.1f}s"


if __name__ == "__main__":
    sys.exit(main())
