"""Pallas crop-based RoIAlign3D (single feature level, opt-in).

The XLA gather formulation (ops/roi_align3d.py) fetches 8 corner values
per sample point (~600k gathered elements per roi at the bbox-head
geometry).  This kernel instead DMAs each roi's bounding window into VMEM
once and evaluates the trilinear interpolation as three separable
interpolation matmuls on the MXU — each needed voxel is read from HBM
exactly once, and the arithmetic runs as dense dots instead of gathers.

Semantics match `roi_align_3d` (CUDA-parity sample coordinates and edge
rules) for every roi whose feature-space extent fits the static window
(MAX_D, MAX_HW): samples outside the window clamp to the window edge, a
documented divergence for degenerate oversized rois only.  Exactness for
in-window rois is tested against the XLA op in interpreter mode and on
hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align3d import _axis_samples


def _interp_matrix(coords, dim, size):
    """(S,) window-relative coords -> (S, size) two-tap interp matrix.

    Implements the CUDA edge rules relative to the window: coords are
    already clamped/validated by the caller; here low/high taps collapse
    at the window edge exactly like the reference kernel's dim-1 clamp.
    `dim` is the valid extent of data inside the window.
    """
    c = jnp.maximum(coords, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    at_edge = low >= dim - 1
    low = jnp.where(at_edge, dim - 1, low)
    high = jnp.where(at_edge, dim - 1, low + 1)
    c = jnp.where(at_edge, low.astype(coords.dtype), c)
    frac = c - low.astype(coords.dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], size), 1)
    # when low == high the two taps coincide and the weights sum to 1,
    # so no special-casing is needed (also keeps all masks 32-bit for
    # the Mosaic lowering: 1-bit minor-dim reshapes are unsupported)
    eq_low = (cols == low[:, None]).astype(coords.dtype)
    eq_high = (cols == high[:, None]).astype(coords.dtype)
    return eq_low * (1.0 - frac)[:, None] + eq_high * frac[:, None]


def _roi_align_kernel(
    starts_ref,  # scalar-prefetch (N, 5) int32 [b, z0, y0, x0, active]
    feats_ref,  # ANY (B, D, H, W, C)
    tile_ref,  # (1, 8, 128) f32: rows 0-2 coords (z,y,x), 3-5 masks
    out_ref,  # (1, Sd, Sh, Sw, C)
    window,  # scratch (MAXD, MAXH, MAXW, C)
    sem,
):
    i = pl.program_id(0)
    b = starts_ref[i, 0]
    z0 = starts_ref[i, 1]
    y0 = starts_ref[i, 2]
    # the wrapper aligns the W start to 8 (sublane tiling); the hint lets
    # Mosaic prove the DMA slice is tile-aligned
    x0 = pl.multiple_of(starts_ref[i, 3], 8)
    maxd, maxh, maxw, c = window.shape

    # per-roi skip: rois assigned to another FPN level (or padding rois)
    # pay neither the window DMA nor the interpolation — the caller
    # masks the untouched output block away.  This is what makes the
    # multi-level dispatch one-window-per-roi instead of num_levels
    # windows per roi.
    @pl.when(starts_ref[i, 4] != 0)
    def _():
        cp = pltpu.make_async_copy(
            feats_ref.at[
                b,
                pl.ds(z0, maxd),
                pl.ds(y0, maxh),
                pl.ds(x0, maxw),
                :,
            ],
            window,
            sem,
        )
        cp.start()
        cp.wait()

        sd = out_ref.shape[1]
        sh = out_ref.shape[2]
        sw = out_ref.shape[3]
        zmat = _interp_matrix(tile_ref[0, 0, :sd], maxd, maxd)
        ymat = _interp_matrix(tile_ref[0, 1, :sh], maxh, maxh)
        xmat = _interp_matrix(tile_ref[0, 2, :sw], maxw, maxw)
        zmat = zmat * tile_ref[0, 3, :sd][:, None]
        ymat = ymat * tile_ref[0, 4, :sh][:, None]
        xmat = xmat * tile_ref[0, 5, :sw][:, None]

        # separable contractions as unrolled weighted sums: Mosaic
        # cannot shape-cast multi-dim vectors into matmul operands, and
        # the per-roi tensors are small enough that the VPU handles
        # this comfortably.  Contract the widest axis (W) first to
        # minimise the peak VMEM footprint of the intermediates; the
        # window stays bf16 and upcasts slice-by-slice (a full f32 copy
        # would blow the VMEM budget).
        w = window[...]
        c_dim = w.shape[3]
        t1 = jnp.zeros(w.shape[:2] + (sw, c_dim), jnp.float32)
        for wx in range(maxw):
            t1 = t1 + xmat[:, wx][None, None, :, None] * w[:, :, wx][
                :, :, None
            ].astype(jnp.float32)
        t2 = jnp.zeros((w.shape[0], sh, sw, c_dim), jnp.float32)
        for hy in range(maxh):
            t2 = t2 + ymat[:, hy][None, :, None, None] * t1[:, hy][:, None]
        t3 = jnp.zeros((sd, sh, sw, c_dim), jnp.float32)
        for dz in range(maxd):
            t3 = t3 + zmat[:, dz][:, None, None, None] * t2[dz][None]
        out_ref[0] = t3.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_size",
        "out_size_depth",
        "spatial_scale",
        "spatial_scale_depth",
        "sample_num",
        "max_d",
        "max_hw",
        "interpret",
    ),
)
def roi_align_3d_pallas(
    features,
    rois,
    out_size,
    out_size_depth,
    spatial_scale,
    spatial_scale_depth,
    sample_num=2,
    max_d=16,
    max_hw=32,
    interpret=False,
    active=None,
):
    """Crop-based RoIAlign3D. Same signature/result as `roi_align_3d`
    (plus the static window bounds); result is averaged over sample bins.

    active: optional (N,) bool — rois with active=False are skipped
    entirely (no DMA, no compute) and their output rows are UNDEFINED;
    the caller must mask them (the multi-level dispatch does).
    Window bounds clamp to the level extent — when an axis's window
    covers the whole axis the edge clamp equals the global CUDA clamp,
    so small pyramid levels are handled exactly.
    """
    bsz, d, h, w, c = features.shape
    n = rois.shape[0]
    sn = sample_num
    max_d = min(max_d, d)
    max_h = min(max_hw, h)
    max_w = min(max_hw, w)
    c_orig = c
    if c % 128:
        # HBM slices must be lane-aligned (128); pad channels
        pad_c = 128 - c % 128
        features = jnp.pad(
            features, ((0, 0),) * 4 + ((0, pad_c),)
        )
        c = c + pad_c

    batch_idx = rois[:, 0].astype(jnp.int32)
    start_w = rois[:, 1] * spatial_scale
    start_h = rois[:, 2] * spatial_scale
    end_w = (rois[:, 3] + 1.0) * spatial_scale
    end_h = (rois[:, 4] + 1.0) * spatial_scale
    start_d = rois[:, 5] * spatial_scale_depth
    end_d = (rois[:, 6] + 1.0) * spatial_scale_depth
    roi_w = jnp.maximum(end_w - start_w, 0.0)
    roi_h = jnp.maximum(end_h - start_h, 0.0)
    roi_d = jnp.maximum(end_d - start_d, 0.0)

    xs = _axis_samples(start_w, roi_w, out_size, sn)  # (N, Sw) global
    ys = _axis_samples(start_h, roi_h, out_size, sn)
    zs = _axis_samples(start_d, roi_d, out_size_depth, sn)

    def prep(coords, dim, max_len, align=1):
        # CUDA rules applied in GLOBAL coords, then made window-relative;
        # `align` keeps the DMA start tiling-aligned (sublane = 8 on the
        # second-minor memref dim)
        in_range = ((coords >= -1.0) & (coords <= dim)).astype(jnp.float32)
        cg = jnp.clip(coords, 0.0, dim - 1.0)
        w0 = jnp.clip(
            jnp.floor(cg.min(axis=1)).astype(jnp.int32),
            0,
            jnp.maximum(dim - max_len, 0),
        )
        w0 = (w0 // align) * align
        rel = jnp.clip(
            cg - w0[:, None].astype(cg.dtype), 0.0, max_len - 1.0
        )
        return rel.astype(jnp.float32), in_range, w0

    # alignment slack on the tiled W axis; whole-axis window when the
    # level is too small for slack (x0 is then 0, trivially aligned)
    max_w_win = max_w + 8 if w >= max_w + 8 else w
    xr, xin, x0 = prep(xs, w, max_w_win, align=8)
    yr, yin, y0 = prep(ys, h, max_h)
    zr, zin, z0 = prep(zs, d, max_d)
    if active is None:
        act = jnp.ones((n,), jnp.int32)
    else:
        act = active.astype(jnp.int32)
    starts = jnp.stack([batch_idx, z0, y0, x0, act], axis=1)

    sd, sh_, sw = zr.shape[1], yr.shape[1], xr.shape[1]

    # pack per-roi coords+masks into one (8, 128) VMEM tile per roi
    # (TPU blocks need (8k, 128k) trailing dims)
    assert max(sd, sh_, sw) <= 128
    tile = jnp.zeros((n, 8, 128), jnp.float32)
    tile = tile.at[:, 0, :sd].set(zr)
    tile = tile.at[:, 1, :sh_].set(yr)
    tile = tile.at[:, 2, :sw].set(xr)
    tile = tile.at[:, 3, :sd].set(zin)
    tile = tile.at[:, 4, :sh_].set(yin)
    tile = tile.at[:, 5, :sw].set(xin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
            pl.BlockSpec(
                (1, 8, 128), lambda i, s: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sd, sh_, sw, c), lambda i, s: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((max_d, max_h, max_w_win, c), features.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    samples = pl.pallas_call(
        _roi_align_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n, sd, sh_, sw, c), features.dtype
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, features, tile)

    samples = samples.reshape(
        n, out_size_depth, sn, out_size, sn, out_size, sn, c
    )
    return samples.mean(axis=(2, 4, 6))[..., :c_orig]


def multi_level_roi_align_3d_pallas(
    feats,
    rois,
    out_size,
    out_size_depth,
    featmap_strides,
    featmap_strides_depth,
    sample_num=2,
    finest_scale=56,
    valid=None,
    max_d=16,
    max_hw=32,
    interpret=False,
):
    """FPN-level dispatch over the Pallas crop kernel (opt-in via
    bbox_roi_extractor.roi_layer.use_pallas).

    Each roi pays exactly ONE window DMA + interpolation: the per-level
    kernel launch skips (no DMA, no compute) every roi not assigned to
    that level via the scalar-prefetched active flag, and the masked
    sum selects each roi's (only defined) row.  Window bounds clamp to
    each level's extent, so small pyramid levels run whole-level
    windows with exact global-clamp semantics.
    """
    from .roi_align3d import map_roi_levels, multi_level_roi_align_3d

    num_levels = len(feats)
    target = map_roi_levels(rois, num_levels, finest_scale)
    out = None
    for lvl, f in enumerate(feats):
        md = min(max_d, f.shape[1])
        mh = max_hw  # per-axis clamping happens inside the kernel call
        act = target == lvl
        if valid is not None:
            act = act & valid
        if f.shape[3] < 8 and not interpret:
            # sub-sublane-wide level (toy inputs only): the whole-axis
            # DMA window would be under the 8-sublane tile — keep the
            # XLA gather for this level on hardware (negligible size)
            o = multi_level_roi_align_3d(
                [f], rois, out_size, out_size_depth,
                [featmap_strides[lvl]], [featmap_strides_depth[lvl]],
                sample_num, finest_scale=finest_scale, valid=act,
            )
        else:
            o = roi_align_3d_pallas(
                f,
                rois,
                out_size,
                out_size_depth,
                1.0 / featmap_strides[lvl],
                1.0 / featmap_strides_depth[lvl],
                sample_num,
                max_d=md,
                max_hw=mh,
                interpret=interpret,
                active=act,
            )
        # each roi maps to exactly one level -> masked sum selects it
        # (skipped rois' rows are undefined, so mask BEFORE summing)
        sel = act[:, None, None, None, None]
        o = jnp.where(sel, o, 0.0)
        out = o if out is None else out + o
    return out
