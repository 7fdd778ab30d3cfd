"""Native C++ host-ops parity vs numpy references."""
import numpy as np
import pytest

from mrcnn3d import native
from mrcnn3d.ops.nms3d import nms_3d_overlap_numpy


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (build failed)")
    return lib


def test_crop_normalize(lib):
    rng = np.random.RandomState(0)
    vol = rng.rand(24, 20, 12).astype(np.float32) * 255
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    out = native.crop_normalize_volume(vol, 4, 2, 3, 8, 10, 6, mean, std)
    assert out.shape == (6, 8, 10, 3)
    crop = vol[4:12, 2:12, 3:9]
    want = (np.transpose(crop, (2, 0, 1))[..., None] - mean) / std
    np.testing.assert_allclose(out, want.astype(np.float32), atol=1e-5)


def _trilinear_ref(vol, out_shape):
    """Scalar-loop trilinear oracle with grid-center coords, edge clamp."""
    d, h, w, c = vol.shape
    od, oh, ow = out_shape
    out = np.zeros((od, oh, ow, c), np.float32)

    def axis(i, n_out, n_in):
        p = np.clip((i + 0.5) * n_in / n_out - 0.5, 0, n_in - 1)
        lo = int(p)
        hi = min(lo + 1, n_in - 1)
        return lo, hi, p - lo

    for z in range(od):
        zl, zh, fz = axis(z, od, d)
        for y in range(oh):
            yl, yh, fy = axis(y, oh, h)
            for x in range(ow):
                xl, xh, fx = axis(x, ow, w)
                v = (
                    vol[zl, yl, xl] * (1 - fz) * (1 - fy) * (1 - fx)
                    + vol[zl, yl, xh] * (1 - fz) * (1 - fy) * fx
                    + vol[zl, yh, xl] * (1 - fz) * fy * (1 - fx)
                    + vol[zl, yh, xh] * (1 - fz) * fy * fx
                    + vol[zh, yl, xl] * fz * (1 - fy) * (1 - fx)
                    + vol[zh, yl, xh] * fz * (1 - fy) * fx
                    + vol[zh, yh, xl] * fz * fy * (1 - fx)
                    + vol[zh, yh, xh] * fz * fy * fx
                )
                out[z, y, x] = v
    return out


def test_resize_trilinear(lib):
    rng = np.random.RandomState(1)
    vol = rng.rand(8, 10, 12, 3).astype(np.float32)
    out = native.resize_trilinear(vol, 12, 15, 18)
    want = _trilinear_ref(vol, (12, 15, 18))
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_nms_overlap_matches_numpy(lib):
    rng = np.random.RandomState(2)
    x1 = rng.uniform(0, 50, 40)
    y1 = rng.uniform(0, 50, 40)
    z1 = rng.uniform(0, 15, 40)
    dets = np.stack(
        [
            x1, y1,
            x1 + rng.uniform(4, 25, 40),
            y1 + rng.uniform(4, 25, 40),
            z1,
            z1 + rng.uniform(2, 10, 40),
            rng.uniform(0, 1, 40),
        ],
        axis=-1,
    ).astype(np.float32)
    for thr in (0.1, 0.3, 0.5):
        got = native.nms3d_overlap(dets, thr)
        want = nms_3d_overlap_numpy(dets, thr)
        assert got == want, thr


def test_voxel_iou(lib):
    a = np.zeros((8, 8, 8), np.uint8)
    b = np.zeros((8, 8, 8), np.uint8)
    a[:4] = 1
    b[2:6] = 1
    got = native.voxel_iou(a, b)
    assert got == pytest.approx((2 * 64) / (6 * 64))
