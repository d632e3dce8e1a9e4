"""2-process CPU multi-host test (VERDICT r2 next-#9).

Spawns two real jax processes (jax.distributed.initialize on a local
coordinator, 4 virtual CPU devices each -> one 8-device global 'data'
mesh), each loading its process_batch_slice of the global batch, and
checks the jitted data-parallel step produces the same result on both
processes AND matches the single-process value — the multi-host claim
of parallel/mesh.py tested, not asserted.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
import jax.numpy as jnp
import numpy as np
from codenet_tpu.parallel import (get_mesh, process_batch_slice,
                                  global_batch_from_local, replicate_tree)
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2
assert len(jax.devices()) == 8

mesh = get_mesh()
gbs = 16
rng = np.random.RandomState(0)
full_x = rng.randn(gbs, 8, 8, 4).astype(np.float32)
full_y = rng.randn(gbs, 1).astype(np.float32)
w = rng.randn(4 * 8 * 8, 1).astype(np.float32) * 0.1

lo, hi = process_batch_slice(gbs)
batch = global_batch_from_local(
    mesh, {"x": full_x[lo:hi], "y": full_y[lo:hi]})
params = replicate_tree(mesh, {"w": jnp.asarray(w)})

@jax.jit
def step(params, batch):
    pred = batch["x"].reshape(batch["x"].shape[0], -1) @ params["w"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    g = jax.grad(lambda p: jnp.mean(
        (batch["x"].reshape(batch["x"].shape[0], -1) @ p["w"]
         - batch["y"]) ** 2))(params)
    return loss, g["w"]

loss, gw = step(params, batch)
# reference: single-process numpy on the FULL batch
pred = full_x.reshape(gbs, -1) @ w
ref_loss = np.mean((pred - full_y) ** 2)
np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
print("proc", proc_id, "loss", float(loss), "OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("{repo!r}", repr(REPO)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    pypath = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
              if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pypath) if pypath else ""
    procs = [subprocess.Popen([sys.executable, str(script), str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"
        assert "OK" in out, out[-2000:]
