"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors how multi-chip TPU code is unit-tested without hardware: XLA's host
platform is split into 8 devices so `jax.sharding.Mesh`-based code paths are
exercised for real (something the reference never had — SURVEY.md §4).
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
