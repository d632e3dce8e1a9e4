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

# Persistent compilation cache: the big-model tests compile multi-minute XLA
# programs on CPU; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# make the repo importable regardless of pytest invocation directory
import sys
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

# The axon TPU plugin (sitecustomize) force-selects its platform regardless
# of env vars; override through jax.config so tests really run on the
# 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
