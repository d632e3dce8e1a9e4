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


def data_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name="data"):
    """Place a dict of host arrays with batch-dim sharding."""
    s = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)


def replicate_tree(mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
