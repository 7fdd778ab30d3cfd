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
    m = jnp.where(cols == low[:, None], (1.0 - frac)[:, None], 0.0)
    m = m + jnp.where(cols == high[:, None], frac[:, None], 0.0)
    # fully collapse (low == high): weight 1 at that column
    m = jnp.where(
        (low == high)[:, None] & (cols == low[:, None]),
        1.0,
        jnp.where((low == high)[:, None] & (cols != low[:, None]), 0.0, m),
    )
    return m


def _roi_align_kernel(
    starts_ref,  # scalar-prefetch (N, 4) int32 [b, z0, y0, x0]
    feats_ref,  # ANY (B, D, H, W, C)
    zs_ref,  # (1, Sd) f32 window-relative sample coords
    ys_ref,  # (1, Sh)
    xs_ref,  # (1, Sw)
    zin_ref,  # (1, Sd) f32 in-range masks (CUDA -1/dim rule)
    yin_ref,
    xin_ref,
    out_ref,  # (1, Sd, Sh, Sw, C)
    window,  # scratch (MAXD, MAXH, MAXW, C)
    sem,
):
    i = pl.program_id(0)
    b = starts_ref[i, 0]
    z0 = starts_ref[i, 1]
    y0 = starts_ref[i, 2]
    x0 = starts_ref[i, 3]
    maxd, maxh, maxw, c = window.shape

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
    zmat = _interp_matrix(zs_ref[0, :sd], maxd, maxd)
    ymat = _interp_matrix(ys_ref[0, :sh], maxh, maxh)
    xmat = _interp_matrix(xs_ref[0, :sw], maxw, maxw)
    zmat = zmat * zin_ref[0, :sd][:, None]
    ymat = ymat * yin_ref[0, :sh][:, None]
    xmat = xmat * xin_ref[0, :sw][:, None]

    w = window[...]
    t = jnp.einsum(
        "sd,dhwc->shwc", zmat, w, preferred_element_type=jnp.float32
    )
    t = jnp.einsum(
        "ph,shwc->spwc", ymat, t, preferred_element_type=jnp.float32
    )
    t = jnp.einsum(
        "qw,spwc->spqc", xmat, t, preferred_element_type=jnp.float32
    )
    out_ref[0] = t.astype(out_ref.dtype)


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
):
    """Crop-based RoIAlign3D. Same signature/result as `roi_align_3d`
    (plus the static window bounds); result is averaged over sample bins.
    """
    bsz, d, h, w, c = features.shape
    n = rois.shape[0]
    sn = sample_num
    assert d >= max_d and h >= max_hw and w >= max_hw, (
        "window must fit inside the feature level; size it per level"
    )

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

    def prep(coords, dim, max_len):
        # CUDA rules applied in GLOBAL coords, then made window-relative
        in_range = ((coords >= -1.0) & (coords <= dim)).astype(jnp.float32)
        cg = jnp.clip(coords, 0.0, dim - 1.0)
        w0 = jnp.clip(
            jnp.floor(cg.min(axis=1)).astype(jnp.int32),
            0,
            jnp.maximum(dim - max_len, 0),
        )
        rel = jnp.clip(
            cg - w0[:, None].astype(cg.dtype), 0.0, max_len - 1.0
        )
        return rel.astype(jnp.float32), in_range, w0

    xr, xin, x0 = prep(xs, w, max_hw)
    yr, yin, y0 = prep(ys, h, max_hw)
    zr, zin, z0 = prep(zs, d, max_d)
    starts = jnp.stack([batch_idx, z0, y0, x0], axis=1)

    sd, sh_, sw = zr.shape[1], yr.shape[1], xr.shape[1]

    def pad128(a):
        # TPU blocks need a 128-divisible (or full) trailing dim
        k = -(-a.shape[1] // 128) * 128
        return jnp.pad(a, ((0, 0), (0, k - a.shape[1])))

    zr, yr, xr = pad128(zr), pad128(yr), pad128(xr)
    zin, yin, xin = pad128(zin), pad128(yin), pad128(xin)
    # index maps receive (grid index, scalar-prefetch ref)
    row = lambda i, s: (i, 0)  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # features stay in HBM
            pl.BlockSpec((1, zr.shape[1]), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yr.shape[1]), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xr.shape[1]), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zin.shape[1]), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yin.shape[1]), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xin.shape[1]), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sd, sh_, sw, c), lambda i, s: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((max_d, max_hw, max_hw, c), features.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    samples = pl.pallas_call(
        _roi_align_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n, sd, sh_, sw, c), features.dtype
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, features, zr, yr, xr, zin, yin, xin)

    samples = samples.reshape(
        n, out_size_depth, sn, out_size, sn, out_size, sn, c
    )
    return samples.mean(axis=(2, 4, 6))
