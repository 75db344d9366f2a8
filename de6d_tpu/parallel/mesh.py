"""SPMD device-mesh utilities.

TPU-native replacement for the reference's NCCL/DDP stack
(/root/reference/core/pcdet/utils/common_utils.py:145-187 dist init,
commu_utils.py NCCL wrappers, train.py:143-144 DDP wrap): one jitted
train step over a ``jax.sharding.Mesh`` with the global batch sharded
on the 'data' axis. XLA inserts the gradient psum over ICI; BatchNorm
reductions over the sharded batch axis become cross-replica
reductions automatically (SyncBN for free).

Multi-host: each process feeds its local shard via
``jax.make_array_from_process_local_data``; eval gathers host-side
results with multihost_utils.process_allgather (replacing the
reference's filesystem pickle gather, common_utils.py:212-233).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh (the reference's only parallelism is DP —
    SURVEY.md §2.6). The mesh axis rides ICI within a slice."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch dict with the leading dim sharded over
    the data axis."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
