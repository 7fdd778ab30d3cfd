"""ctypes bindings for the C++ host runtime (native/host_ops.cpp).

Builds on demand with make/g++ (toolchain is in the image); every entry
point has a numpy fallback so the framework works without the library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmrcnn3d_host.so")

_lib = None


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR],
        check=True,
        capture_output=True,
    )


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.crop_normalize_volume.argtypes = [
        f32p, i64, i64, i64, i64, i64, i64, i64, i64, i64, f32p, f32p, f32p
    ]
    lib.crop_normalize_volume.restype = None
    lib.resize_trilinear.argtypes = [
        f32p, i64, i64, i64, i64, i64, i64, i64, f32p
    ]
    lib.resize_trilinear.restype = None
    lib.nms3d_overlap.argtypes = [f32p, i64, ctypes.c_float, i64p]
    lib.nms3d_overlap.restype = i64
    lib.voxel_iou.argtypes = [u8p, u8p, i64]
    lib.voxel_iou.restype = ctypes.c_double
    _lib = lib
    return _lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def crop_normalize_volume(vol_hwd, y0, x0, z0, ch, cw, cd, mean, std):
    """(H, W, D) float32 -> cropped normalised (cd, ch, cw, 3) float32."""
    lib = get_lib()
    vol = np.ascontiguousarray(vol_hwd, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if lib is not None:
        out = np.empty((cd, ch, cw, 3), np.float32)
        h, w, d = vol.shape
        lib.crop_normalize_volume(
            _f32p(vol), h, w, d, y0, x0, z0, ch, cw, cd,
            _f32p(mean), _f32p(std), _f32p(out),
        )
        return out
    crop = vol[y0 : y0 + ch, x0 : x0 + cw, z0 : z0 + cd]
    dhw = np.transpose(crop, (2, 0, 1))
    return ((dhw[..., None] - mean) / std).astype(np.float32)


def resize_trilinear(vol_dhwc, od, oh, ow):
    """Channel-last trilinear resize (skimage grid-center convention)."""
    lib = get_lib()
    vol = np.ascontiguousarray(vol_dhwc, np.float32)
    d, h, w, c = vol.shape
    if lib is not None:
        out = np.empty((od, oh, ow, c), np.float32)
        lib.resize_trilinear(_f32p(vol), d, h, w, c, od, oh, ow, _f32p(out))
        return out
    # pure-numpy vectorised fallback (identical math)
    def axis(n_out, n_in):
        p = np.clip(
            (np.arange(n_out) + 0.5) * n_in / n_out - 0.5, 0, n_in - 1
        )
        lo = p.astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, (p - lo).astype(np.float32)

    zl, zh, fz = axis(od, d)
    yl, yh, fy = axis(oh, h)
    xl, xh, fx = axis(ow, w)
    fz = fz[:, None, None, None]
    fy = fy[None, :, None, None]
    fx = fx[None, None, :, None]

    def g(zi, yi, xi):
        return vol[np.ix_(zi, yi, xi)]

    out = (
        g(zl, yl, xl) * (1 - fz) * (1 - fy) * (1 - fx)
        + g(zl, yl, xh) * (1 - fz) * (1 - fy) * fx
        + g(zl, yh, xl) * (1 - fz) * fy * (1 - fx)
        + g(zl, yh, xh) * (1 - fz) * fy * fx
        + g(zh, yl, xl) * fz * (1 - fy) * (1 - fx)
        + g(zh, yl, xh) * fz * (1 - fy) * fx
        + g(zh, yh, xl) * fz * fy * (1 - fx)
        + g(zh, yh, xh) * fz * fy * fx
    )
    return out.astype(np.float32)


def nms3d_overlap(dets, thr):
    """Asymmetric-overlap greedy NMS; returns kept indices (score desc)."""
    lib = get_lib()
    dets = np.ascontiguousarray(dets, np.float32)
    if lib is not None and len(dets):
        keep = np.empty(len(dets), np.int64)
        n = lib.nms3d_overlap(
            _f32p(dets), len(dets), ctypes.c_float(thr),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return keep[:n].tolist()
    from ..ops.nms3d import nms_3d_overlap_numpy

    return nms_3d_overlap_numpy(dets, thr)


def voxel_iou(a, b):
    lib = get_lib()
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    if lib is not None:
        return float(
            lib.voxel_iou(
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                a.size,
            )
        )
    ia = a.astype(bool)
    ib = b.astype(bool)
    union = np.logical_or(ia, ib).sum()
    return float(np.logical_and(ia, ib).sum() / union) if union else 0.0
