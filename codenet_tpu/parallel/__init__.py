"""Device-mesh parallelism (replaces reference lib/models/data_parallel.py)."""

from .mesh import (  # noqa: F401
    get_mesh, shard_batch, shard_batch_stacked, replicate_tree,
    data_sharding, replicated_sharding)
from .multihost import (  # noqa: F401
    global_batch_from_local, process_batch_slice)
