"""Device mesh + sharding helpers.

The reference's only multi-device strategy is in-graph tower data parallelism
with a concat/mean gradient reduction on device 0
(/root/reference/model/train_multi_gpu.py:16-39, marked WIP/broken).  The
TPU-native replacement: a 1-D ``jax.sharding.Mesh`` over the ``data`` axis;
batches are placed with ``NamedSharding(mesh, P(None, "data"))`` (the leading
axis is the gradient-accumulation micro-step axis) and XLA lowers the gradient
reduction and synchronized batch-norm moments onto ICI all-reduces.

The workload has no sequence axis and a ~2M-parameter convnet, so tensor /
pipeline / sequence / expert parallelism buy nothing here (SURVEY.md §2
checklist) — the scaling axis is the batch.  The mesh is still created
n-dimensional-ready: ``make_mesh((n,), ("data",))`` generalizes to
``make_mesh((n_dcn, n_ici), ("replica", "data"))`` for multi-slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Create a device mesh; defaults to all local devices on one axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis=None, batch_dim: int = 0) -> NamedSharding:
    """Sharding for a batch array whose ``batch_dim`` is split over ``axis``.

    ``axis`` may be one mesh axis name, a tuple of names, or None = ALL mesh
    axes: this workload is pure data parallelism, so on a multi-slice mesh
    ``(replica, data)`` the batch splits over both — gradient all-reduce
    segments ride ICI within a slice and DCN across slices (docs/SCALING.md).
    """
    if axis is None:
        axis = tuple(mesh.axis_names)
    spec = [None] * (batch_dim + 1)
    spec[batch_dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis=None, batch_dim: int = 0):
    """Device-put a (possibly nested) host batch with the batch axis sharded.

    Replaces the reference's queue-runner host->device feed
    (/root/reference/data/dataset_base.py:164-193): one ``jax.device_put``
    with a ``NamedSharding`` scatters each host array across the mesh.

    Under multi-host ``jax.distributed`` each process passes only its LOCAL
    slice of the global batch (its pipeline reads a disjoint shard subset,
    see ``data.pipeline.partition_for_host``); the slices are assembled into
    one global ``jax.Array`` without any cross-host transfer.
    """
    sharding = batch_sharding(mesh, axis, batch_dim)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
