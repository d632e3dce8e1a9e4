"""Multi-host data parallelism helpers (VERDICT r2 next-#9).

The mesh abstraction (mesh.py) spans all devices of all processes; what
multi-host adds is (a) per-process data loading — each host reads only
its slice of every global batch — and (b) assembling a globally-sharded
jax.Array from the process-local shards. The reference has no multi-node
story at all (single-process torch DataParallel, SURVEY §2.2); this is
the TPU-native extension the r2 review asked to be tested rather than
asserted.

Usage (per process):
    jax.distributed.initialize(coordinator, num_processes, process_id)
    mesh = get_mesh()                       # global devices
    lo, hi = process_batch_slice(global_bs)
    local = {k: v[lo:hi] for k, v in host_batch.items()}
    batch = global_batch_from_local(mesh, local, axis_name="data")
    train_step(variables, opt_state, batch)  # XLA all-reduce over ICI/DCN
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def process_batch_slice(global_batch_size, process_index=None,
                        process_count=None):
    """[lo, hi) rows of the global batch this process must load.

    The global batch divides evenly across processes (the same static-
    shape constraint the single-host loader enforces per device).
    """
    idx = jax.process_index() if process_index is None else process_index
    cnt = jax.process_count() if process_count is None else process_count
    assert global_batch_size % cnt == 0, (global_batch_size, cnt)
    per = global_batch_size // cnt
    return idx * per, (idx + 1) * per


def global_batch_from_local(mesh, local_batch, axis_name="data"):
    """Assemble a batch of globally-sharded jax.Arrays from this
    process's local numpy rows (jax.make_array_from_process_local_data:
    each process contributes its contiguous slice of the leading dim)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def one(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sharding, a)

    return {k: one(v) for k, v in local_batch.items()}
