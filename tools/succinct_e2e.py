"""Multi-segment succinct receipt roundtrip ON THE CHIP (VERDICT.md r4
item 5: the CPU host could not finish n>1; the TPU can).

Runs a guest that splits into >=3 segments, proves every segment + its
paging companion, lifts each pair into the recursion circuit, joins to
ONE root proof (ZETH_SUCCINCT=1), verifies the receipt, then checks two
forged-binding rejections. Writes SUCCINCT_E2E_r05.json at the repo
root with the evidence (segment count, per-phase wall times, verified +
tamper-rejected flags)."""

import json
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


def main():
    os.environ["ZETH_SUCCINCT"] = "1"
    po2 = int(os.environ.get("E2E_PO2", "14"))
    os.environ.setdefault("SEGMENT_PO2", str(po2))

    from zeth_tpu import zkvm
    from zeth_tpu.executor import Executor, compute_image_id, guests

    # a spin guest sized for >= 3 segments at the chosen po2
    elf = guests.spin((1 << po2) * 5 // 2)
    env = zkvm.ExecutorEnv.builder().segment_limit_po2(po2).build()
    res = Executor(elf, segment_po2=po2, trace=False).run()
    print(f"guest: {res.total_cycles} cycles", flush=True)

    t0 = time.time()
    info = zkvm.LocalProver().prove(env, elf)
    prove_s = time.time() - t0
    inner = info.receipt.inner
    n_seg = len(inner.segment_publics)
    assert inner.kind == "succinct", inner.kind
    print(f"proved+aggregated {n_seg} segments in {prove_s:.1f}s",
          flush=True)
    assert n_seg >= 3, f"need >=3 segments, got {n_seg}"

    t0 = time.time()
    info.receipt.verify(compute_image_id(elf))
    verify_s = time.time() - t0
    print(f"succinct receipt verified in {verify_s:.2f}s", flush=True)

    # tamper 1: forged companion binding (d0)
    ok_tamper_extra = False
    x0 = inner.segment_extras[0]
    inner.segment_extras[0] = (x0[0],
                               (np.asarray(x0[1], np.uint64)
                                + np.uint64(1)) % np.uint64(2**31 - 1),
                               x0[2], x0[3], x0[4])
    try:
        info.receipt.verify(compute_image_id(elf))
    except zkvm.VerificationError:
        ok_tamper_extra = True
    inner.segment_extras[0] = x0
    print("forged d0 binding rejected:", ok_tamper_extra, flush=True)

    # tamper 2: forged paging public (root limb) on a middle segment
    ok_tamper_paging = False
    mid = n_seg // 2
    inner.paging_publics[mid] = list(inner.paging_publics[mid])
    inner.paging_publics[mid][32] ^= 1
    try:
        info.receipt.verify(compute_image_id(elf))
    except zkvm.VerificationError:
        ok_tamper_paging = True
    inner.paging_publics[mid][32] ^= 1
    print("forged paging root rejected:", ok_tamper_paging, flush=True)

    # tamper 3: forged root seal word
    ok_tamper_seal = False
    seal = inner.root_seal.copy()
    seal[200] ^= 1
    good = inner.root_seal
    inner.root_seal = seal
    try:
        info.receipt.verify(compute_image_id(elf))
    except zkvm.VerificationError:
        ok_tamper_seal = True
    inner.root_seal = good
    print("forged root seal rejected:", ok_tamper_seal, flush=True)

    # in-circuit resolve: a guest that uses the sha-256 accelerator —
    # the batch proof is LIFTED into the root fold (no accelerator seal
    # travels; receipt verification discharges the claim-pinned publics)
    accel_resolved = None
    if os.environ.get("E2E_ACCEL", "1") == "1":
        import hashlib as _hl

        from zeth_tpu.hash.sha256 import IV, pad_message
        block = [int(w) for w in pad_message(b"abc")[0]]
        elf2 = guests.sha256_guest([int(w) for w in IV], block)
        t0 = time.time()
        info2 = zkvm.LocalProver().prove(
            zkvm.ExecutorEnv.builder().build(), elf2)
        accel_s = time.time() - t0
        assert info2.receipt.inner.kind == "succinct"
        assert info2.receipt.inner.accel_publics, "sha claim not lifted"
        info2.receipt.verify(compute_image_id(elf2))
        # tamper a claim-pinned accelerator public -> rejected
        pubs = list(info2.receipt.inner.accel_publics[0][2])
        pubs[1] ^= 1
        info2.receipt.inner.accel_publics[0] = (
            info2.receipt.inner.accel_publics[0][0],
            info2.receipt.inner.accel_publics[0][1], pubs)
        ok = False
        try:
            info2.receipt.verify(compute_image_id(elf2))
        except zkvm.VerificationError:
            ok = True
        assert ok, "tampered accelerator publics accepted"
        accel_resolved = {"sha_guest_prove_s": round(accel_s, 1),
                          "accel_publics_lifted": True,
                          "tamper_accel_pub_rejected": True}
        print("in-circuit accel resolve verified + tamper rejected",
              flush=True)

    out = {
        "segments": n_seg,
        "accel_resolve": accel_resolved,
        "segment_po2": po2,
        "total_cycles": int(res.total_cycles),
        "prove_plus_aggregate_s": round(prove_s, 1),
        "verify_s": round(verify_s, 2),
        "root_seal_KiB": int(inner.root_seal.shape[0]) * 4 // 1024,
        "verified": True,
        "tamper_d0_rejected": ok_tamper_extra,
        "tamper_paging_root_rejected": ok_tamper_paging,
        "tamper_root_seal_rejected": ok_tamper_seal,
        "backend": jax.default_backend(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SUCCINCT_E2E_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    assert ok_tamper_extra and ok_tamper_paging and ok_tamper_seal
    return 0


if __name__ == "__main__":
    sys.exit(main())
