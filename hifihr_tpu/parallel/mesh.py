"""Device mesh + sharding utilities — the distributed backend.

The reference's entire parallelism story is single-node `nn.DataParallel`
(train_hrnet.py:560, SURVEY.md §2.3).  The TPU-native equivalent is SPMD over
a `jax.sharding.Mesh`: batch-shard inputs over the 'data' axis, replicate
parameters, and let the XLA partitioner insert the gradient all-reduce over
ICI.  One compiled program, no replica/gather machinery.

The mesh is 1-D ('data') today; model code never references mesh axes
directly, so growing to a 2-D ('data', 'model') mesh later only changes the
NamedShardings produced here.  Multi-host: call jax.distributed.initialize()
before make_mesh() and the same code spans hosts (DCN between slices).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree, sharded on dim 0.

    Batch size must divide the mesh size; static shapes keep XLA happy.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters, optimizer state) over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
