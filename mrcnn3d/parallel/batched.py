"""Data-parallel batched inference over the device mesh.

BASELINE flow 5 ("batched multi-volume inference throughput on a mesh"):
volumes are independent at test time, so the batch axis shards over
'data' with `shard_map` — each device runs the full single-chip
`simple_test` program on its local shard with ZERO collectives (a plain
sharded jit would instead all-gather the packed RoIAlign feature table,
whose gather indices mix the batch axis).  The reference's equivalent is
MMDistributedDataParallel test scatter (mmdet/apis/train.py _dist_train
+ tools/test.py multi-gpu path).
"""
from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P

from ..detectors import pipeline as pl
from .mesh import data_sharding


def make_batched_infer(model, variables, cfg, anchor_sets, mesh):
    """Returns a jitted fn: batch (B, ...) sharded over 'data' -> outputs.

    B must be a multiple of the mesh size.  Outputs carry the same
    batch sharding (dets/labels/valid per volume).
    """

    def local(batch):
        out = pl.simple_test(model, variables, batch, cfg, anchor_sets)
        return out

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def run(batch):
        ds = data_sharding(mesh)
        batch = jax.tree.map(lambda x: jax.device_put(x, ds), batch)
        return jitted(batch)

    return run
