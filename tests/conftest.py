"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so numeric-tolerance checks are
exact-f32 and multi-chip sharding paths can be exercised without TPU
hardware. The environment's sitecustomize pins JAX_PLATFORMS to the TPU
plugin, so we override via jax.config before any backend initializes.
"""

import os
import sys
from pathlib import Path

# The full suite compiles hundreds of XLA:CPU programs; their JIT code pages
# and allocator arenas are anonymous mmaps that live for the whole process,
# and the run crosses the kernel's default vm.max_map_count (65530) late in
# the suite — the persistent-cache executable deserializer then segfaults on
# a failed mmap. Raise the limit best-effort (works when running as root;
# silently skipped otherwise).
try:
    _MAP_LIMIT = Path("/proc/sys/vm/max_map_count")
    if int(_MAP_LIMIT.read_text()) < 262144:
        _MAP_LIMIT.write_text("262144")
except (OSError, ValueError):
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices timeshare the host's cores; on small hosts (CI runners
# can be 1-core) a straggler rank can exceed XLA:CPU's default collective
# rendezvous timeouts, which CHECK-abort the process ("Termination timeout
# ... Exiting to ensure a consistent program state"). The mesh tests are
# slow there, not deadlocked — give them generous timeouts.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
        " --xla_cpu_collective_timeout_seconds=1800"
    )
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
