"""Driver-contract tests for __graft_entry__ (VERDICT r2 next-#1).

The driver invokes `dryrun_multichip(8)` from a fresh python process that
carries the full login env — including the axon sitecustomize hook
(PYTHONPATH=/root/.axon_site) and JAX_PLATFORMS=axon, whose health the
dryrun does not control. These tests reproduce that invocation exactly:
the outer process gets the axon env *restored* (conftest scrubbed it),
and the dryrun must still pass because it never touches the TPU plugin.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The login-shell env the driver runs under: axon plugin registered
    in every python process, default platform forced to axon."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = env.get("PALLAS_AXON_POOL_IPS",
                                          "127.0.0.1")
    env["PALLAS_AXON_TPU_GEN"] = env.get("PALLAS_AXON_TPU_GEN", "v5e")
    site = "/root/.axon_site"
    pypath = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if os.path.isdir(site) and site not in pypath:
        env["PYTHONPATH"] = os.pathsep.join([site] + pypath)
    # the conftest's CPU-mesh XLA flag must not leak into the check
    env.pop("XLA_FLAGS", None)
    return env


def test_scrubbed_env_has_no_tpu_hooks():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    env = ge.scrubbed_cpu_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    for k in env:
        assert not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU")), k
    assert "axon" not in env.get("PYTHONPATH", "")


@pytest.mark.slow
def test_dryrun_multichip_as_the_driver_runs_it():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_driver_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=1500)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "OK" in proc.stdout, proc.stdout[-4000:]
