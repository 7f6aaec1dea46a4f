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
