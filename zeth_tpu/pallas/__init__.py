"""Hand-written Pallas TPU kernels for the prove core.

These kernels fuse the hot loops of the STARK prover (Poseidon2 Merkle
leaf hashing, pair-tree reduction, FRI fold) into single-dispatch VMEM
programs. Each kernel is bit-identical to its XLA reference
implementation in zeth_tpu.hash / zeth_tpu.zkp (tested in
tests/test_pallas.py) and is auto-selected by shape; the XLA paths
remain the oracle and the fallback for small shapes, the CPU mesh and
interpret mode.
"""

import os

import jax


def enabled(arr=None) -> bool:
    """Kernels run on real single-device TPU arrays only: the CPU mesh
    (tests, dryrun) and GSPMD-sharded arrays take the XLA paths."""
    if os.environ.get("ZETH_NO_PALLAS", "0") == "1":
        return False
    if jax.default_backend() == "cpu":
        return False
    if arr is not None:
        sh = getattr(arr, "sharding", None)
        if sh is not None and getattr(sh, "num_devices", 1) != 1:
            return False
        # arrays placed on a non-TPU device (e.g. the companion paging
        # prove offloaded to the host CPU backend) take the XLA path
        try:
            devs = arr.devices() if callable(
                getattr(arr, "devices", None)) else None
            if devs and next(iter(devs)).platform != "tpu":
                return False
        except Exception:
            pass
    return True
