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


def process_barrier(name: str, timeout_ms: int = 600_000):
    """Cross-process barrier over the coordination service (KV store).

    Aligns hosts around COMPILE skew: the first train-step execution
    initialises the CPU-collectives (Gloo) context with a ~30 s
    rendezvous window, but a cold XLA compile of the step can take
    minutes and finish at very different times across hosts — a fast
    host then times out waiting for a still-compiling peer.  This
    barrier rides the jax.distributed coordination service (no device
    collectives), so it tolerates minutes of skew.  No-op when
    jax.distributed was never initialised.
    """
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except Exception:
        return
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def globalize_batch(mesh: Mesh, batch):
    """Assemble per-host local batch shards into global jax.Arrays.

    Multi-process DP (reference init_dist + DistributedGroupSampler,
    mmdet/apis/env.py:13-50): every host loads its own rank-strided
    shard of the global batch; the global array sharded on 'data' is
    built from the local rows without any cross-host data movement
    (each host's rows land on its own devices).  No-op single-process.
    """
    if jax.process_count() == 1:
        return batch
    ds = data_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            ds, np.asarray(x)
        ),
        batch,
    )
