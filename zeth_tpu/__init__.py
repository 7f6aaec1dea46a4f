"""zeth-tpu: a TPU-native STARK proving framework.

A from-scratch JAX/XLA/Pallas re-design of the proving stack that
risc0/zeth's Ethereum block proofs bottom out in (see SURVEY.md):

- ``zeth_tpu.field``     Baby Bear + degree-4 extension as uint32 JAX ops
- ``zeth_tpu.ntt``       batched radix-2 NTT / iNTT / coset LDE
- ``zeth_tpu.hash``      Poseidon2 / SHA-256 / Keccak-f[1600] batch kernels, Merkle
- ``zeth_tpu.zkp``       DEEP-ALI + FRI STARK prover (device) and verifier (host)
- ``zeth_tpu.circuits``  AIRs: rv32im zkVM circuit, keccak accelerator, toy circuits
- ``zeth_tpu.executor``  RV32IM emulator (C++) + ELF loading + segmentation
- ``zeth_tpu.recursion`` segment lift/join aggregation scheduler
- ``zeth_tpu.parallel``  mesh/sharding layer: multi-chip NTT, pod-parallel proving
- ``zeth_tpu.app``       the zeth application layer: chainspec, MPT, stateless
                         validation, host API, CLI, rpc-proxy
"""

__version__ = "0.1.0"

# Large numpy buffers default to mmap/munmap per allocation (glibc's
# 128 KiB threshold); on this VM class page faults cost ~1 ms, which made
# witgen/aux host stages 10-50x slower than their arithmetic. Keep big
# blocks on the heap free list so repeated prove calls reuse warm pages.
def _tune_malloc():
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)    # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 28)    # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()
del _tune_malloc
