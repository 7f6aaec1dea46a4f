"""Minimal on-chip prove smoke: one small spin segment, prove twice
(compile + steady state), verify incl. the companion paging proof.

SMOKE_PO2 picks the segment size (default 14 — ~12k cycles, finishes in
a couple of minutes cold). Use this before bench.py when validating a
prover change on the attached chip: it prints per-phase progress, so a
hang is attributable (bench.py only prints at the end)."""

import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from zeth_tpu.circuits import rv32im as rv
from zeth_tpu.executor import Executor, compute_image_id, load_image, guests

po2 = int(os.environ.get("SMOKE_PO2", "14"))
print("backend:", jax.default_backend(), flush=True)
elf = guests.spin(((1 << po2) - 4096) * 3 // 2)
entry, ia, iw = load_image(elf)
res = Executor(elf, segment_po2=po2, trace=True).run()
seg = res.segments[0]
print("executed", seg.trace.shape[0], "cycles", flush=True)
t0 = time.time()
seal, pg = rv.prove_segment(seg, ia, iw)
print("prove1 %.1fs" % (time.time() - t0), flush=True)
t0 = time.time()
seal, pg = rv.prove_segment(seg, ia, iw)
print("prove2 %.1fs" % (time.time() - t0), flush=True)
import hashlib
from zeth_tpu.zkvm import ReceiptClaim
claim = ReceiptClaim(image_id=compute_image_id(elf),
                     journal_digest=hashlib.sha256(res.journal).digest(),
                     exit_code=0)
rv.verify_segments([seal], [pg], claim, ia, iw, entry)
print("verified", flush=True)
