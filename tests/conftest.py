"""Test configuration: force an 8-device virtual CPU mesh.

Per the framework's multi-chip strategy (SURVEY.md §2.3): sharding is
validated on a virtual CPU mesh; real-TPU runs happen in bench.py and the
driver's dryrun harness.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The jaxtyping pytest plugin imports jax BEFORE this conftest runs, which
# freezes JAX_PLATFORMS from the parent shell (often "axon" — the real TPU
# tunnel) into jax.config. Backends are not yet initialized here, so force
# the CPU platform through the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compilation cache here — entries written by a
# different host (the axon TPU tunnel's machine) have mismatched CPU
# features and segfault on load.

# Watchdog: if a test run wedges (e.g. a compile deadlock), dump all thread
# stacks every 240s so the hang site is visible in the log.
import faulthandler as _fh
_fh.dump_traceback_later(240, repeat=True)
