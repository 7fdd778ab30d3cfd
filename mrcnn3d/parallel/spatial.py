"""Spatial sharding of the whole-volume conv forward over ICI.

The reference handles volumes that exceed one device's memory by patch
tiling only (SURVEY.md section 5).  On a TPU mesh, XLA's SPMD partitioner
can instead split the *depth axis of the volume itself* across chips —
convolutions over a sharded spatial dimension get their halo exchanges
inserted automatically — so one whole-volume backbone+FPN pass runs with
1/N activation memory per chip and collectives riding ICI.  The detection
stages (proposals onward) consume replicated features.

This is a new capability relative to the reference (a single GPU could
never hold the 768^2 x 240 activations).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_extract_feat(model, variables, mesh: Mesh, axis: str = "data",
                         batch_axis: str | None = None):
    """Returns a jitted extract_feat with the volume depth axis sharded.

    imgs (B, D, H, W, 3) are sharded over D across `axis`; FPN outputs are
    gathered back to replicated for the (cheap) detection stages.
    With `batch_axis` (2-D mesh from make_mesh2), the batch dim is
    additionally sharded — hybrid DP x spatial inference.

    D must be divisible by the mesh axis size times the total depth
    stride (16) for even sharding; pad the volume accordingly.
    """
    in_sh = NamedSharding(mesh, P(batch_axis, axis))
    out_sh = NamedSharding(mesh, P(batch_axis))
    model = _with_spatial_shard(model, mesh, axis, batch_axis)

    @jax.jit
    def fn(imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, in_sh)
        feats = model.apply(variables, imgs, method=model.extract_feat)
        return tuple(
            jax.lax.with_sharding_constraint(f, out_sh) for f in feats
        )

    return fn


def _with_spatial_shard(model, mesh, axis, batch_axis=None):
    """Clone the model with per-stage depth-sharding annotations.

    The in-model constraints (ResNet3D.spatial_shard) replicate any
    stage whose depth no longer divides the mesh axis — letting XLA's
    SPMD partitioner propagate a depth sharding onto stages with fewer
    slices than shards miscompiles their strided convs (empty shards).
    Duck-typed wrappers without .clone (tests) are returned unchanged.
    """
    clone = getattr(model, "clone", None)
    if clone is None:
        return model
    # only ResNet3D implements the per-stage constraints; silently
    # accepting another backbone would let XLA propagate a depth
    # sharding onto stages with fewer slices than shards — the exact
    # strided-conv miscompile the constraints exist to prevent
    btype = getattr(model, "backbone_type", "ResNet3D")
    if btype not in ("ResNet3D",):
        raise ValueError(
            f"spatial depth-sharding requires the ResNet3D backbone "
            f"(got {btype}): other backbones lack the per-stage "
            f"sharding constraints (see ResNet3D.spatial_shard)"
        )
    shard = (mesh, axis, batch_axis) if batch_axis else (mesh, axis)
    return clone(spatial_shard=shard)


def sharded_simple_test(model, variables, cfg, anchor_sets, mesh,
                        axis: str = "data",
                        batch_axis: str | None = None):
    """Whole-volume inference with the backbone spatially sharded.

    Feature extraction runs depth-sharded; proposals/heads/NMS run
    replicated (they are <5%% of the FLOPs).  With `batch_axis` (2-D
    mesh), volumes are additionally batch-sharded: hybrid DP x spatial.
    """
    from ..detectors import pipeline as pl

    # GSPMD cannot partition the Pallas crop-align custom call — force
    # the einsum/gather align formulations, which shard like any XLA op
    import copy as _copy

    if cfg.model.get("bbox_roi_extractor") or cfg.model.get(
        "mask_roi_extractor"
    ):
        cfg = _copy.deepcopy(cfg)
        for key in ("bbox_roi_extractor", "mask_roi_extractor"):
            if cfg.model.get(key):
                cfg.model[key]["roi_layer"]["use_pallas_infer"] = False

    in_sh = NamedSharding(mesh, P(batch_axis, axis))
    model = _with_spatial_shard(model, mesh, axis, batch_axis)

    @jax.jit
    def fn(batch):
        batch = {
            k: jax.lax.with_sharding_constraint(v, in_sh)
            if k.startswith("imgs")
            else v
            for k, v in batch.items()
        }
        out = pl.simple_test(model, variables, batch, cfg, anchor_sets)
        return out["dets"], out["labels"], out["valid"]

    return fn
