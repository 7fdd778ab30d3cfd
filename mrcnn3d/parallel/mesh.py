"""Device mesh + sharding helpers.

The reference's only parallelism is data parallelism over NCCL DDP
(SURVEY.md section 2.8); here DP is a 1-D `jax.sharding.Mesh` over ICI with
batch arrays sharded on the 'data' axis and parameters replicated — XLA
inserts the gradient all-reduce (psum) automatically from these
annotations, replacing mmdet's DistOptimizerHook explicit collective
(mmdet/core/utils/dist_utils.py:134-182).

A second 'model' axis is reserved for spatial sharding of whole-volume
inference (shard_map over D/H/W), a capability the reference never had.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices)
    devs = np.asarray(devices[:n_data]).reshape(n_data)
    return Mesh(devs, axis_names=("data",))


def make_mesh2(
    n_data: int, n_depth: int, devices=None
) -> Mesh:
    """2-D mesh for hybrid parallelism: batch over 'data', the volume
    depth axis over 'depth' (conv halo exchanges inserted by XLA's SPMD
    partitioner; see parallel/spatial.py).  Lay 'depth' innermost so its
    halo collectives ride adjacent ICI links."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_depth
    devs = np.asarray(devices[: n_data * n_depth]).reshape(
        n_data, n_depth
    )
    return Mesh(devs, axis_names=("data", "depth"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with batch-axis sharding."""
    ds = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ds), batch)
