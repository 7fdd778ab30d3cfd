"""RoIAlign3D vs a scalar numpy oracle implementing the CUDA kernel math
(reference mmdet/ops/roi_align/src/roi_align_kernel.cu:64-291), plus a
finite-difference gradient check (replacing the reference's gradcheck.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrcnn3d.ops.roi_align3d import multi_level_roi_align_3d, roi_align_3d


def _trilinear(data, d, h, w, z, y, x):
    if z < -1.0 or z > d or y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    z, y, x = max(z, 0.0), max(y, 0.0), max(x, 0.0)
    zl, yl, xl = int(z), int(y), int(x)
    if zl >= d - 1:
        zh = zl = d - 1
        z = float(zl)
    else:
        zh = zl + 1
    if yl >= h - 1:
        yh = yl = h - 1
        y = float(yl)
    else:
        yh = yl + 1
    if xl >= w - 1:
        xh = xl = w - 1
        x = float(xl)
    else:
        xh = xl + 1
    lz, ly, lx = z - zl, y - yl, x - xl
    hz, hy, hx = 1 - lz, 1 - ly, 1 - lx
    v = 0.0
    for (zi, wz) in ((zl, hz), (zh, lz)):
        for (yi, wy) in ((yl, hy), (yh, ly)):
            for (xi, wx) in ((xl, hx), (xh, lx)):
                v += wz * wy * wx * data[zi, yi, xi]
    return v


def roi_align_3d_numpy(
    features, rois, out, out_d, scale, scale_d, sample_num
):
    """features (B, D, H, W, C); rois (N, 7)."""
    b, d, h, w, c = features.shape
    n = rois.shape[0]
    result = np.zeros((n, out_d, out, out, c), np.float32)
    for i in range(n):
        bi = int(rois[i, 0])
        sw = rois[i, 1] * scale
        sh = rois[i, 2] * scale
        ew = (rois[i, 3] + 1) * scale
        eh = (rois[i, 4] + 1) * scale
        sd = rois[i, 5] * scale_d
        ed = (rois[i, 6] + 1) * scale_d
        rw = max(ew - sw, 0.0)
        rh = max(eh - sh, 0.0)
        rd = max(ed - sd, 0.0)
        bw, bh, bd = rw / out, rh / out, rd / out_d
        for ci in range(c):
            data = features[bi, :, :, :, ci]
            for pd in range(out_d):
                for ph in range(out):
                    for pw in range(out):
                        acc = 0.0
                        for iz in range(sample_num):
                            z = sd + pd * bd + (iz + 0.5) * bd / sample_num
                            for iy in range(sample_num):
                                y = sh + ph * bh + (iy + 0.5) * bh / sample_num
                                for ix in range(sample_num):
                                    x = (
                                        sw
                                        + pw * bw
                                        + (ix + 0.5) * bw / sample_num
                                    )
                                    acc += _trilinear(data, d, h, w, z, y, x)
                        result[i, pd, ph, pw, ci] = acc / sample_num**3
    return result


def test_matches_scalar_oracle():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 8, 16, 16, 3).astype(np.float32)
    rois = np.array(
        [
            [0, 4, 4, 27, 30, 2, 9],
            [1, 0, 0, 15, 15, 0, 15],
            [0, 10, 12, 50, 55, 5, 14],
            [1, 60, 60, 70, 70, 14, 15],  # partially outside
        ],
        np.float32,
    )
    got = roi_align_3d(
        jnp.asarray(feats), jnp.asarray(rois), 7, 3, 0.25, 0.5, 2
    )
    want = roi_align_3d_numpy(feats, rois, 7, 3, 0.25, 0.5, 2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_degenerate_roi():
    feats = np.ones((1, 4, 8, 8, 1), np.float32)
    rois = np.array([[0, 3, 3, 3, 3, 1, 1]], np.float32)  # single voxel
    got = np.asarray(
        roi_align_3d(jnp.asarray(feats), jnp.asarray(rois), 7, 3, 1.0, 1.0, 2)
    )
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_gradient_finite_difference():
    rng = np.random.RandomState(3)
    feats = rng.randn(1, 4, 8, 8, 2).astype(np.float32)
    rois = np.array([[0, 1, 1, 6, 6, 0, 3]], np.float32)

    def f(x):
        out = roi_align_3d(x, jnp.asarray(rois), 3, 2, 0.5, 0.5, 2)
        return jnp.sum(out * out)

    grad = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    eps = 1e-3
    for idx in [(0, 1, 2, 3, 0), (0, 2, 4, 4, 1), (0, 0, 0, 0, 0)]:
        fp = feats.copy()
        fp[idx] += eps
        fm = feats.copy()
        fm[idx] -= eps
        num = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (
            2 * eps
        )
        assert abs(num - grad[idx]) < 1e-2, idx


def test_multi_level_dispatch():
    rng = np.random.RandomState(5)
    feats = [
        jnp.asarray(rng.randn(1, 16, 32, 32, 4).astype(np.float32)),
        jnp.asarray(rng.randn(1, 8, 16, 16, 4).astype(np.float32)),
    ]
    # small roi -> level 0; large roi -> level 1
    rois = jnp.asarray(
        [
            [0, 10, 10, 20, 20, 2, 6],  # scale ~ sqrt(11*11*5)=24 -> lvl 0
            [0, 0, 0, 120, 120, 0, 30],  # scale large -> lvl 1
        ],
        jnp.float32,
    )
    out = multi_level_roi_align_3d(
        feats, rois, 7, 3, [4, 8], [2, 4], sample_num=2
    )
    assert out.shape == (2, 3, 7, 7, 4)
    # level-0 roi must equal direct align on level 0
    direct0 = roi_align_3d(feats[0], rois[:1], 7, 3, 0.25, 0.5, 2)
    np.testing.assert_allclose(
        np.asarray(out[:1]), np.asarray(direct0), atol=1e-5
    )
    direct1 = roi_align_3d(feats[1], rois[1:], 7, 3, 1 / 8, 0.25, 2)
    np.testing.assert_allclose(
        np.asarray(out[1:]), np.asarray(direct1), atol=1e-5
    )


def test_fused_matches_reference_dispatch():
    from mrcnn3d.ops.roi_align3d import multi_level_roi_align_3d_reference

    rng = np.random.RandomState(11)
    feats = [
        jnp.asarray(rng.randn(2, 16, 32, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 16, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 2, 4, 4, 8).astype(np.float32)),
    ]
    n = 24
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 80, n)
    z1 = rng.uniform(0, 20, n)
    rois = np.stack(
        [
            rng.randint(0, 2, n).astype(np.float64),
            x1, y1,
            x1 + rng.uniform(4, 120, n),
            y1 + rng.uniform(4, 120, n),
            z1,
            z1 + rng.uniform(2, 10, n),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = rng.rand(n) > 0.2
    args = ([4, 8, 16, 32], [2, 4, 8, 16])
    ref = multi_level_roi_align_3d_reference(
        feats, jnp.asarray(rois), 7, 3, *args, 2, valid=jnp.asarray(valid)
    )
    fused = multi_level_roi_align_3d(
        feats, jnp.asarray(rois), 7, 3, *args, 2, valid=jnp.asarray(valid)
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=1e-4
    )


def test_fused_gradients_flow():
    from mrcnn3d.ops.roi_align3d import multi_level_roi_align_3d

    rng = np.random.RandomState(12)
    feats = [
        jnp.asarray(rng.randn(1, 8, 16, 16, 4).astype(np.float32)),
        jnp.asarray(rng.randn(1, 4, 8, 8, 4).astype(np.float32)),
    ]
    rois = jnp.asarray([[0, 2, 2, 30, 30, 1, 6]], jnp.float32)

    def f(f0):
        out = multi_level_roi_align_3d(
            [f0, feats[1]], rois, 7, 3, [4, 8], [2, 4], 2
        )
        return jnp.sum(out**2)

    g = jax.grad(f)(feats[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_pallas_crop_align_matches_xla_interpret():
    """Pallas crop-based RoIAlign (interpreter) == XLA gather op."""
    from mrcnn3d.ops.roi_align3d_pallas import roi_align_3d_pallas

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 16, 48, 48, 8).astype(np.float32))
    rois = jnp.asarray(
        np.array(
            [
                [0, 4, 4, 27, 30, 2, 9],
                [1, 0, 0, 60, 60, 0, 15],
                [0, 10, 12, 80, 90, 5, 20],
                [1, 40, 40, 100, 100, 10, 25],
            ],
            np.float32,
        )
    )
    ref = roi_align_3d(feats, rois, 7, 3, 0.25, 0.5, 2)
    got = roi_align_3d_pallas(
        feats, rois, 7, 3, 0.25, 0.5, 2, max_d=16, max_hw=40,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4
    )


def test_chunked_matches_unchunked():
    from mrcnn3d.ops.roi_align3d import multi_level_roi_align_3d_chunked

    rng = np.random.RandomState(13)
    feats = [
        jnp.asarray(rng.randn(2, 16, 32, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 16, 16, 8).astype(np.float32)),
    ]
    n = 37  # not a multiple of chunk -> exercises remainder padding
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 80, n)
    z1 = rng.uniform(0, 20, n)
    rois = jnp.asarray(
        np.stack(
            [rng.randint(0, 2, n).astype(np.float64), x1, y1,
             x1 + rng.uniform(4, 60, n), y1 + rng.uniform(4, 60, n),
             z1, z1 + rng.uniform(2, 10, n)], -1,
        ).astype(np.float32)
    )
    valid = jnp.asarray(rng.rand(n) > 0.2)
    full = multi_level_roi_align_3d(
        feats, rois, 7, 3, [4, 8], [2, 4], 2, valid=valid
    )
    chunked = multi_level_roi_align_3d_chunked(
        feats, rois, 7, 3, [4, 8], [2, 4], 2, valid=valid, chunk=16
    )
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), atol=1e-5
    )


def test_multi_level_pallas_matches_gather():
    """Opt-in Pallas multi-level dispatch == the XLA gather extractor
    (interpreter mode on CPU; hardware exactness covered by the
    single-level test + tools/bench_ops.py)."""
    from mrcnn3d.ops.roi_align3d_pallas import (
        multi_level_roi_align_3d_pallas,
    )

    rng = np.random.RandomState(21)
    feats = [
        jnp.asarray(rng.randn(2, 16, 32, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 16, 16, 8).astype(np.float32)),
    ]
    n = 12
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    z1 = rng.uniform(0, 20, n)
    rois = jnp.asarray(
        np.stack(
            [rng.randint(0, 2, n).astype(np.float64), x1, y1,
             x1 + rng.uniform(4, 50, n), y1 + rng.uniform(4, 50, n),
             z1, z1 + rng.uniform(2, 10, n)], -1,
        ).astype(np.float32)
    )
    valid = jnp.asarray(rng.rand(n) > 0.2)
    ref = multi_level_roi_align_3d(
        feats, rois, 7, 3, [4, 8], [2, 4], 2, valid=valid
    )
    got = multi_level_roi_align_3d_pallas(
        feats, rois, 7, 3, [4, 8], [2, 4], 2, valid=valid,
        max_d=16, max_hw=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_multi_level_pallas_misfit_fallback_exact():
    """Rois whose extent exceeds the crop window are recomputed exactly
    through the cond-skipped xfirst fallback: the full wrapper output
    matches the XLA extractor even with extreme-aspect-ratio rois."""
    from mrcnn3d.ops.roi_align3d_pallas import (
        multi_level_roi_align_3d_pallas,
    )

    rng = np.random.RandomState(31)
    feats = [
        jnp.asarray(rng.randn(1, 16, 48, 48, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 8, 24, 24, 8).astype(np.float32)),
    ]
    rois = jnp.asarray(
        [
            [0, 4, 4, 20, 20, 2, 8],      # fits
            [0, 0, 80, 180, 95, 2, 10],   # 45-wide at level 0: misfit
            [0, 2, 2, 30, 150, 0, 12],    # 37-tall at level 0: misfit
            [0, 8, 8, 40, 40, 4, 20],     # fits
        ],
        jnp.float32,
    )
    ref = multi_level_roi_align_3d(
        feats, rois, 7, 3, [4, 8], [2, 4], 2
    )
    got = multi_level_roi_align_3d_pallas(
        feats, rois, 7, 3, [4, 8], [2, 4], 2,
        max_d=16, max_hw=32, interpret=True, fallback_k=4,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    # beyond-fallback_k misfits keep the (clamped) kernel value, but
    # every FIT roi must still be exact
    got1 = multi_level_roi_align_3d_pallas(
        feats, rois, 7, 3, [4, 8], [2, 4], 2,
        max_d=16, max_hw=32, interpret=True, fallback_k=1,
    )
    keep = np.array([0, 3])
    np.testing.assert_allclose(
        np.asarray(got1)[keep], np.asarray(ref)[keep], atol=2e-4
    )


def test_multi_level_pallas_whole_axis_z_exact():
    """Levels whose depth fits max_d run whole-axis z windows — a
    z-spanning roi is exact with no fallback needed."""
    from mrcnn3d.ops.roi_align3d_pallas import (
        multi_level_roi_align_3d_pallas,
    )

    rng = np.random.RandomState(32)
    feats = [
        jnp.asarray(rng.randn(1, 32, 32, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 16, 16, 16, 8).astype(np.float32)),
    ]
    # full-depth rois (z extent = 64 input voxels = 32 level-0 feature
    # voxels, deeper than any 16-slice window)
    rois = jnp.asarray(
        [[0, 4, 4, 24, 24, 0, 63], [0, 10, 10, 50, 50, 0, 63]],
        jnp.float32,
    )
    ref = multi_level_roi_align_3d(
        feats, rois, 7, 3, [4, 8], [2, 4], 2
    )
    got = multi_level_roi_align_3d_pallas(
        feats, rois, 7, 3, [4, 8], [2, 4], 2,
        max_d=48, max_hw=32, interpret=True, fallback_k=0,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_multi_level_pallas_unaligned_depth_exact():
    """Levels whose depth is not a sublane-tile multiple (12, 6 — the
    1.5x bench pathway) must still be exact: the wrapper zero-pads the
    depth axis to the tile and the padded rows carry zero weight.  On
    hardware this geometry is ALSO a Mosaic lowering regression test
    (partial unaligned slice of the tiled D dim, caught on v5e)."""
    from mrcnn3d.ops.roi_align3d_pallas import (
        multi_level_roi_align_3d_pallas,
    )

    rng = np.random.RandomState(33)
    feats = [
        jnp.asarray(rng.randn(1, 12, 48, 48, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 6, 24, 24, 8).astype(np.float32)),
    ]
    rois = jnp.asarray(
        [
            [0, 4, 4, 40, 40, 2, 20],
            [0, 100, 100, 400, 400, 0, 90],  # deep + wide: level 1
            [0, 60, 60, 90, 90, 10, 40],
        ],
        jnp.float32,
    )
    ref = multi_level_roi_align_3d(
        feats, rois, 7, 3, [16, 32], [8, 16], 2
    )
    got = multi_level_roi_align_3d_pallas(
        feats, rois, 7, 3, [16, 32], [8, 16], 2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_pipeline_pallas_flag(monkeypatch):
    """use_pallas in the roi_layer config routes _roi_align_cfg to the
    Pallas extractor."""
    from mrcnn3d.detectors.pipeline import _roi_align_cfg

    rng = np.random.RandomState(22)
    feats = [
        jnp.asarray(rng.randn(1, 16, 32, 32, 4).astype(np.float32)),
        jnp.asarray(rng.randn(1, 8, 16, 16, 4).astype(np.float32)),
    ]
    # rois sized within the per-level Pallas windows (oversized rois
    # clamp to the window edge — the documented opt-in divergence)
    rois = jnp.asarray(
        [[0, 4, 4, 20, 20, 2, 8], [0, 2, 2, 42, 42, 1, 10]], jnp.float32
    )
    cfg = dict(
        roi_layer=dict(out_size=7, out_size_depth=3, sample_num=2,
                       use_pallas=True),
        featmap_strides=[4, 8],
        featmap_strides_depth=[2, 4],
    )
    got = _roi_align_cfg(feats, rois, cfg)
    base = dict(cfg)
    base["roi_layer"] = dict(cfg["roi_layer"], use_pallas=False)
    want = _roi_align_cfg(feats, rois, base)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4
    )


def test_dense_matches_reference_dispatch():
    """Training-path dense separable formulation == naive dispatch oracle
    (forward), including level dispatch, batch routing, validity masking
    and out-of-range/edge rules."""
    from mrcnn3d.ops.roi_align3d import (
        multi_level_roi_align_3d_dense,
        multi_level_roi_align_3d_reference,
    )

    rng = np.random.RandomState(31)
    feats = [
        jnp.asarray(rng.randn(2, 16, 32, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 16, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 2, 4, 4, 8).astype(np.float32)),
    ]
    n = 24
    x1 = rng.uniform(-5, 80, n)
    y1 = rng.uniform(-5, 80, n)
    z1 = rng.uniform(-2, 20, n)
    rois = np.stack(
        [
            rng.randint(0, 2, n).astype(np.float64),
            x1, y1,
            x1 + rng.uniform(4, 120, n),
            y1 + rng.uniform(4, 120, n),
            z1,
            z1 + rng.uniform(2, 14, n),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = rng.rand(n) > 0.2
    args = ([4, 8, 16, 32], [2, 4, 8, 16])
    ref = multi_level_roi_align_3d_reference(
        feats, jnp.asarray(rois), 7, 3, *args, 2, valid=jnp.asarray(valid)
    )
    dense = multi_level_roi_align_3d_dense(
        feats, jnp.asarray(rois), 7, 3, *args, 2, valid=jnp.asarray(valid)
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(ref), atol=1e-4
    )


def test_dense_gradients_match_gather():
    """Dense-path backward (einsum transposes) == corner-gather backward
    (scatter-add): the train-step swap does not change gradients."""
    from mrcnn3d.ops.roi_align3d import (
        multi_level_roi_align_3d,
        multi_level_roi_align_3d_dense,
    )

    rng = np.random.RandomState(32)
    feats = [
        jnp.asarray(rng.randn(1, 8, 16, 16, 4).astype(np.float32)),
        jnp.asarray(rng.randn(1, 4, 8, 8, 4).astype(np.float32)),
    ]
    rois = jnp.asarray(
        [[0, 2, 2, 30, 30, 1, 6], [0, 10, 8, 60, 52, 2, 12]], jnp.float32
    )

    def loss(fn, fs):
        out = fn([fs[0], fs[1]], rois, 7, 3, [4, 8], [2, 4], 2)
        return jnp.sum(out**2)

    gd = jax.grad(lambda fs: loss(multi_level_roi_align_3d_dense, fs))(feats)
    gg = jax.grad(lambda fs: loss(multi_level_roi_align_3d, fs))(feats)
    for a, b in zip(gd, gg):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        )


@pytest.mark.slow  # 20 s; xfirst is a CPU-path formulation — its parity
# vs gather stays guarded once per round (Pallas/dense/gather parity
# remains in the fast tier); r5 fast-tier trim
def test_xfirst_matches_gather_dispatch():
    """Inference x-first separable path == corner-gather multi-level
    dispatch (single-volume, mask geometry, chunk remainder)."""
    from mrcnn3d.ops.roi_align3d import (
        multi_level_roi_align_3d_xfirst_chunked,
    )

    rng = np.random.RandomState(21)
    feats = [
        jnp.asarray(rng.randn(1, 16, 32, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 8, 16, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 4, 8, 8, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 2, 4, 4, 8).astype(np.float32)),
    ]
    n = 53  # not a multiple of chunk
    x1 = rng.uniform(0, 100, n)
    y1 = rng.uniform(0, 100, n)
    z1 = rng.uniform(0, 24, n)
    rois = jnp.asarray(
        np.stack(
            [np.zeros(n), x1, y1,
             x1 + rng.uniform(4, 150, n), y1 + rng.uniform(4, 150, n),
             z1, z1 + rng.uniform(2, 20, n)], -1,
        ).astype(np.float32)
    )
    valid = jnp.asarray(rng.rand(n) > 0.2)
    args = (14, 10, [4, 8, 16, 32], [2, 4, 8, 16], 2)
    ref = multi_level_roi_align_3d(feats, rois, *args, valid=valid)
    got = multi_level_roi_align_3d_xfirst_chunked(
        feats, rois, *args, valid=valid, chunk=16
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5
    )


def test_multi_level_pallas_small_coarse_levels():
    """Coarse pyramid levels too small for the aligned window run as
    whole-level windows inside the Pallas kernel (exact global clamp) —
    no XLA-gather fallback; skipped rois (other level / invalid) are
    undefined and masked."""
    from mrcnn3d.ops.roi_align3d_pallas import (
        multi_level_roi_align_3d_pallas,
    )

    rng = np.random.RandomState(33)
    feats = [
        jnp.asarray(rng.randn(2, 16, 32, 32, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 16, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 8, 8, 8).astype(np.float32)),
    ]
    n = 16
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    z1 = rng.uniform(0, 20, n)
    # spread roi sizes so all three levels receive rois
    sz = rng.uniform(4, 100, n)
    rois = jnp.asarray(
        np.stack(
            [rng.randint(0, 2, n).astype(np.float64), x1, y1,
             x1 + sz, y1 + sz, z1, z1 + rng.uniform(2, 10, n)], -1,
        ).astype(np.float32)
    )
    valid = jnp.asarray(rng.rand(n) > 0.2)
    ref = multi_level_roi_align_3d(
        feats, rois, 7, 3, [4, 8, 16], [2, 4, 8], 2, valid=valid
    )
    got = multi_level_roi_align_3d_pallas(
        feats, rois, 7, 3, [4, 8, 16], [2, 4, 8], 2, valid=valid,
        max_d=16, max_hw=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
