"""On-chip validation + timing of the Pallas kernels vs the XLA oracle."""

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
from zeth_tpu.hash import poseidon2 as P2
from zeth_tpu.pallas import poseidon2 as PP


def force(x):
    return jax.device_get(x[tuple([-1] * x.ndim)])


def main():
    rng = np.random.default_rng(1)
    # correctness on a modest shape
    r, c = 4096, 37
    m = jnp.asarray(rng.integers(0, F.P, size=(r, c), dtype=np.uint32))
    t0 = time.time()
    got = PP.hash_rows(m)
    force(got)
    print(f"pallas leaf compile+run: {time.time() - t0:.1f}s", flush=True)
    want = P2.hash_rows(m)
    ok = bool(jnp.array_equal(got, want))
    print("leaf_hash matches XLA:", ok, flush=True)
    if not ok:
        print(np.asarray(got)[:2], np.asarray(want)[:2])
        return 1

    # timing at main-group scale
    for (rr, cc) in [(1 << 20, 1009), (1 << 20, 108), (1 << 16, 64)]:
        big = jnp.asarray(rng.integers(0, F.P, size=(rr, cc),
                                       dtype=np.uint32))
        force(big)
        force(PP.hash_rows(big))
        t0 = time.time()
        force(PP.hash_rows(big))
        tp = time.time() - t0
        if rr * cc > P2.STREAM_HASH_ELEMS:
            xla = lambda: P2.hash_rows_large(big)
        else:
            xla = lambda: P2.hash_rows(big)
        force(xla())
        t0 = time.time()
        force(xla())
        tx = time.time() - t0
        print(f"leaf ({rr}x{cc}): pallas {tp * 1e3:.0f} ms vs XLA "
              f"{tx * 1e3:.0f} ms", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
