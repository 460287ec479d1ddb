"""Device mesh + sharding utilities — the distributed backend.

The reference's entire parallelism story is single-node `nn.DataParallel`
(train_hrnet.py:560, SURVEY.md §2.3).  The TPU-native equivalent is SPMD over
a `jax.sharding.Mesh`: batch-shard inputs, replicate (or FSDP-shard)
parameters, and let the XLA partitioner insert the collectives over ICI.
One compiled program, no replica/gather machinery.

Two supported layouts:

  * 1-D ('data',): pure data parallelism.  Params replicated; gradient
    all-reduce inserted by XLA.  The faithful port of DataParallel.
  * 2-D ('data', 'fsdp'): hybrid DP + ZeRO-style parameter/optimizer
    sharding.  The batch shards over BOTH axes (every chip computes a
    batch/(d*f) slice); each parameter shards its largest eligible dim over
    'fsdp' and is replicated across 'data'.  XLA turns parameter use into an
    all-gather over 'fsdp' and the gradient reduction into
    psum-over-'data' + reduce-scatter-over-'fsdp' — optimizer state stays
    sharded, cutting per-chip memory ~f× for params/opt-state.  No model code
    changes: only the NamedShardings produced here differ.

Multi-host: call jax.distributed.initialize() before make_mesh() and the same
code spans hosts (DCN between slices).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def make_mesh(n_devices: int | None = None, devices=None, fsdp: int = 1) -> Mesh:
    """1-D ('data',) mesh, or 2-D ('data', 'fsdp') when fsdp > 1."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if fsdp > 1:
        assert len(devices) % fsdp == 0, (len(devices), fsdp)
        return Mesh(devices.reshape(len(devices) // fsdp, fsdp),
                    (DATA_AXIS, FSDP_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over every mesh axis."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, x) -> NamedSharding:
    """FSDP rule: shard x's largest dim divisible by the fsdp axis size;
    replicate anything too small (biases, BN stats, scalars)."""
    if FSDP_AXIS not in mesh.axis_names:
        return replicated(mesh)
    f = mesh.shape[FSDP_AXIS]
    shape = getattr(x, "shape", ())
    if not shape:
        return replicated(mesh)
    # largest dim first so the big matmul operands shard, not kernel windows
    for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[d] % f == 0 and shape[d] >= 2 * f:
            spec = [None] * len(shape)
            spec[d] = FSDP_AXIS
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree, sharded on dim 0.

    Batch size must divide the mesh size; static shapes keep XLA happy.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree (parameters, optimizer state) on the mesh: fully
    replicated on a 1-D mesh; FSDP-sharded per `param_sharding` on a 2-D
    ('data', 'fsdp') mesh.  Name kept from the DP-only days — call sites don't
    care which layout the mesh uses."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, param_sharding(mesh, x)), tree
    )
