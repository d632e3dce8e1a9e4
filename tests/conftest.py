"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors how multi-chip TPU code is unit-tested without hardware: XLA's
host platform is split into 8 devices so `jax.sharding.Mesh`-based code
paths are exercised for real (something the reference never had —
SURVEY.md §4).

The TPU plugin's sitecustomize imports jax at interpreter start, which
(a) locks in env-read config (the compile cache dir) before conftest
runs and (b) leaves the remote-compile hook installed, which silently
disables persistent-cache writes even after switching the platform to
CPU. So: if the process did not start with JAX_PLATFORMS=cpu, re-exec
pytest once with a scrubbed env (same fix as __graft_entry__'s hermetic
dryrun_multichip). The persistent cache then works, cutting warm full-
suite time by the multi-minute XLA CPU compiles of full-model programs.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")


def _scrubbed_env():
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU"))
    }
    pypath = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
              if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pypath + [_REPO]) if pypath \
        else _REPO
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    env["_CODENET_TEST_REEXEC"] = "1"
    return env


_NEEDS_REEXEC = (os.environ.get("JAX_PLATFORMS") != "cpu"
                 and not os.environ.get("_CODENET_TEST_REEXEC"))

# direct invocation with a clean env (e.g. CI images without the TPU
# plugin): make sure the same settings apply in-process
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# make the repo importable regardless of pytest invocation directory
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Two-tier test selection (VERDICT r2 next-#8): multi-minute full-model
# compiles are @pytest.mark.slow; `pytest tests` runs the fast tier,
# `pytest tests --runslow` runs everything.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full-model XLA "
                          "compiles, multi-minute cold)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-model compile tests (run with --runslow)")
    if _NEEDS_REEXEC:
        # The process started with the TPU plugin env: env-read jax config
        # (compile-cache dir) is already locked in and the plugin's
        # remote-compile hook blocks persistent-cache writes. Re-exec with
        # the scrubbed CPU env — suspending pytest's fd capture first so
        # the replacement process writes to the real stdout.
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        os.execvpe(sys.executable,
                   [sys.executable, "-m", "pytest"] + sys.argv[1:],
                   _scrubbed_env())


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
