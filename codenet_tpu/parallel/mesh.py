"""Data parallelism over a jax.sharding.Mesh.

The reference's distributed story is single-process multi-GPU
torch.nn.DataParallel with uneven chunk splitting
(lib/models/data_parallel.py:10-129, lib/models/scatter_gather.py:6-38,
chunk_sizes derived in lib/opts.py:284-293). TPU-native replacement: a 1-D
'data' mesh over all chips; batches shard on the leading axis, parameters
replicate, and XLA inserts the gradient all-reduce over ICI when the jitted
train step consumes sharded batches against replicated params. Uneven
chunks are obsolete on homogeneous chips (config keeps --master_batch_size
as a warned no-op).

Multi-host extension: the same mesh spec over jax.devices() spanning
processes, with per-process data loading by jax.process_index() — the mesh
abstraction here does not preclude it.

Beyond data parallelism (--spatial_shard): a 2-D ('data', 'spatial') mesh
additionally shards the image H axis — GSPMD spatially partitions the
backbone convolutions with automatic halo exchange over ICI, which is the
TPU-native way to scale HIGH-RESOLUTION training (512² --w2 and beyond)
past per-chip batch granularity. The deform kernels' custom_partitioning
rules prefer batch-only sharding, so GSPMD re-gathers H exactly at the
neck, where maps are already small (<= 1/32 res) and the gather is cheap.
The other classic axes are deliberately absent, with reasons: tensor
parallelism (the largest weight, layer4's 1024x464 1x1, is ~0.5 MB —
replication costs nothing and TP's per-layer all-reduces would dominate),
pipeline parallelism (the whole model is ~2-6 M params; one stage),
expert parallelism (no MoE layers exist in any CoDeNet architecture).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None, axis_name="data"):
    """1-D mesh over all local devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def get_mesh_for_batch(batch_size, devices=None, axis_name="data"):
    """1-D mesh over the most devices that evenly divide `batch_size`
    (batches shard on the leading axis; XLA requires divisibility)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.array(devices[:n]), (axis_name,))


def get_mesh_2d(spatial, batch_size=None, devices=None):
    """('data', 'spatial') mesh: the trailing `spatial` devices of each
    row shard the image H axis; the rest of the device count goes to the
    batch axis (shrunk until it divides batch_size, like
    get_mesh_for_batch)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(
            f"--spatial_shard {spatial} does not divide the device count "
            f"{n}; pick a divisor of the number of chips")
    nd = n // spatial
    if batch_size is not None:
        while nd > 1 and batch_size % nd != 0:
            nd -= 1
    devices = np.array(devices[:nd * spatial]).reshape(nd, spatial)
    return Mesh(devices, ("data", "spatial"))


# batch fields whose dim 1 is the image H axis (shardable over 'spatial');
# every other field shards on the batch dim only
_SPATIAL_FIELDS = ("input", "input_u8")


def shard_batch_stacked(mesh, batches, axis_name="data"):
    """Stack a list of per-step batch dicts on a new leading (step) axis
    and place the result in one transfer: (K, B, ...) with the batch dim
    (axis 1) sharded over `axis_name` and the step dim replicated.

    Through a remote-dispatch link (axon tunnel) every device_put and
    every jit call is a network round trip; the scan-based multi-step
    (engine/trainer.py run_epoch) uses this to turn K steps' uploads
    into ONE upload of a (K, ...) stack."""
    import numpy as np
    s = NamedSharding(mesh, P(None, axis_name))
    spatial = "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
    out = {}
    for k in batches[0]:
        a = np.stack([b[k] for b in batches], axis=0)
        if spatial and k in _SPATIAL_FIELDS \
                and a.shape[2] % mesh.shape["spatial"] == 0:
            sp = NamedSharding(mesh, P(None, axis_name, "spatial"))
            out[k] = jax.device_put(a, sp)
        else:
            out[k] = jax.device_put(a, s)
    return out


def data_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name="data"):
    """Place a dict of host arrays with batch-dim sharding; on a 2-D
    ('data', 'spatial') mesh the image tensors additionally shard H
    (GSPMD halo-exchanges the conv boundaries)."""
    s = NamedSharding(mesh, P(axis_name))
    spatial = "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
    out = {}
    for k, a in batch.items():
        if spatial and k in _SPATIAL_FIELDS:
            if a.shape[1] % mesh.shape["spatial"] != 0:
                # degrading to data-only parallelism must not be silent
                import warnings
                warnings.warn(
                    f"spatial_shard: image H={a.shape[1]} is not divisible "
                    f"by the spatial axis ({mesh.shape['spatial']}); '{k}' "
                    "is replicated over 'spatial' for this batch",
                    stacklevel=2)
                out[k] = jax.device_put(a, s)
                continue
            sp = NamedSharding(mesh, P(axis_name, "spatial"))
            out[k] = jax.device_put(a, sp)
        else:
            out[k] = jax.device_put(a, s)
    return out


def replicate_tree(mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
