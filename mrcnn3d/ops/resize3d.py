"""On-device separable trilinear volume resize.

Replicates the host runtime's grid-center (half-pixel) convention
(native/host_ops.cpp resize_trilinear: cpos = (i+0.5)*in/out - 0.5
clamped to [0, in-1], 2-tap lerp per axis), which is itself the
skimage.transform.resize convention the reference uses to build the
1.5x-resolution twin volume (reference coco_3d_2scales.py:209-234).

Trilinear interpolation is separable, so each axis is one dense
(out_n, in_n) 2-tap banded matrix contracted on the MXU — three
einsums replace the host resize + the host->device transfer of the
materialised twin (the 1.5x twin of a 512^2x240 SWI volume is 1.3 GB
in bf16; deriving it on device removes that upload entirely, which
profiling showed dominated whole-volume tiled inference on
remote-attached devices).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def axis_lerp_matrix(out_n: int, in_n: int) -> np.ndarray:
    """(out_n, in_n) f32 matrix applying the grid-center 2-tap lerp."""
    i = np.arange(out_n, dtype=np.float64)
    cpos = np.clip((i + 0.5) * in_n / out_n - 0.5, 0.0, in_n - 1)
    lo = np.floor(cpos).astype(np.int64)
    hi = np.minimum(lo + 1, in_n - 1)
    fr = (cpos - lo).astype(np.float32)
    m = np.zeros((out_n, in_n), np.float32)
    m[np.arange(out_n), lo] += 1.0 - fr
    m[np.arange(out_n), hi] += fr
    return m


def resize_trilinear_3d(vol, out_dhw):
    """Resize (D, H, W, C) -> (D', H', W', C), f32 accumulation.

    Matches mrcnn3d.native.resize_trilinear voxel-for-voxel up to f32
    summation order (tested in tests/test_resize3d.py, which also
    covers the tiled driver deriving the twin through this path).
    """
    od, oh, ow = (int(v) for v in out_dhw)
    d, h, w, c = (int(v) for v in vol.shape)
    dtype = vol.dtype
    # LAYOUT CONSTRAINT (r5, remote TPU backend): any layout-sensitive
    # op — dot, transpose, slice — whose operand/result has the 3-wide
    # channel axis as its minor dimension materialises it 128-lane
    # padded (42.7x the logical bytes; at whole-volume scale the
    # compiler aborts).  So the volume only ever appears here in FUSED
    # views whose minor dim is spatial*C: the z/y lerps are plain
    # matmuls over those views, and the x lerp — which would need the
    # (W, C) split — is a static 2-tap gather-lerp on the fused axis
    # instead of a dot.
    x = vol.reshape(d, h * w * c).astype(jnp.float32)
    mz = jnp.asarray(axis_lerp_matrix(od, d))
    my = jnp.asarray(axis_lerp_matrix(oh, h))
    x = jnp.einsum("ad,dm->am", mz, x)            # (od, h*w*c)
    x = jnp.einsum("bh,ahm->abm", my, x.reshape(od, h, w * c))
    # x axis: out[..., j, k] = (1-fr_j)*v[..., lo_j, k] + fr_j*v[..., hi_j, k]
    i = np.arange(ow, dtype=np.float64)
    cpos = np.clip((i + 0.5) * w / ow - 0.5, 0.0, w - 1)
    lo = np.floor(cpos).astype(np.int64)
    hi = np.minimum(lo + 1, w - 1)
    fr = (cpos - lo).astype(np.float32)
    ks = np.arange(c, dtype=np.int64)
    idx_lo = jnp.asarray((lo[:, None] * c + ks).reshape(-1))   # (ow*c,)
    idx_hi = jnp.asarray((hi[:, None] * c + ks).reshape(-1))
    w_lo = jnp.asarray(np.repeat(1.0 - fr, c))
    w_hi = jnp.asarray(np.repeat(fr, c))
    x = (jnp.take(x, idx_lo, axis=2) * w_lo
         + jnp.take(x, idx_hi, axis=2) * w_hi)    # (od, oh, ow*c)
    return x.reshape(od, oh, ow, c).astype(dtype)
