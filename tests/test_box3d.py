"""Geometry/codec parity tests.

Oracle values come from the reference's own inline self-test
(mmdet/core/bbox/geometry.py:81-102 bbox_overlaps_test) and from
independent numpy reimplementations of the documented math.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mrcnn3d.ops.box3d import (
    bbox2delta3d,
    bbox_overlaps_3d,
    bbox_overlaps_aligned_3d,
    delta2bbox3d,
    xyxyzz_to_xywhzd,
)


class TestIoU:
    def test_reference_vectors(self):
        # vectors from reference geometry.py:81-102
        cases = [
            ([[2, 3, 4, 6, 3, 4]], [[2, 3, 4, 6, 3, 4]], 1.0),
            ([[39, 63, 203, 112, 4, 5]], [[54, 66, 198, 114, 4, 5]], 0.798),
            ([[49, 75, 203, 125, 4, 5]], [[42, 78, 186, 126, 4, 5]], 0.7899),
            ([[31, 69, 201, 125, 4, 5]], [[18, 63, 235, 135, 4, 5]], 0.6125),
        ]
        for b1, b2, expected in cases:
            iou = bbox_overlaps_3d(
                jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)
            )
            assert round(float(iou[0, 0]), 4) == expected

    def test_matrix_shape(self):
        b1 = jnp.asarray(
            [[2, 3, 4, 6, 3, 4], [39, 63, 203, 112, 4, 5]], jnp.float32
        )
        b2 = jnp.asarray(
            [
                [2, 3, 4, 6, 3, 4],
                [54, 66, 198, 114, 4, 5],
                [49, 75, 203, 125, 4, 5],
            ],
            jnp.float32,
        )
        result = bbox_overlaps_3d(b1, b2)
        assert result.shape == (2, 3)
        assert int(result[0, 0]) == 1

    def test_disjoint(self):
        b1 = jnp.asarray([[0, 0, 10, 10, 0, 5]], jnp.float32)
        b2 = jnp.asarray([[100, 100, 110, 110, 50, 55]], jnp.float32)
        assert float(bbox_overlaps_3d(b1, b2)[0, 0]) == 0.0

    def test_iof_mode(self):
        b1 = jnp.asarray([[0, 0, 9, 9, 0, 9]], jnp.float32)  # vol 1000
        b2 = jnp.asarray([[0, 0, 19, 19, 0, 19]], jnp.float32)
        iof = bbox_overlaps_3d(b1, b2, mode="iof")
        assert float(iof[0, 0]) == pytest.approx(1.0)

    def test_aligned(self):
        b = jnp.asarray(
            [[0, 0, 9, 9, 0, 9], [5, 5, 14, 14, 0, 9]], jnp.float32
        )
        out = bbox_overlaps_aligned_3d(b, b)
        np.testing.assert_allclose(np.asarray(out), [1.0, 1.0])


class TestDeltaCodec:
    def test_roundtrip_identity(self):
        rng = np.random.RandomState(0)
        x1 = rng.uniform(0, 100, (50,))
        y1 = rng.uniform(0, 100, (50,))
        z1 = rng.uniform(0, 30, (50,))
        props = np.stack(
            [
                x1,
                y1,
                x1 + rng.uniform(2, 60, (50,)),
                y1 + rng.uniform(2, 60, (50,)),
                z1,
                z1 + rng.uniform(1, 20, (50,)),
            ],
            axis=-1,
        ).astype(np.float32)
        # gts as moderate perturbations of proposals: deltas stay inside
        # the codec's clip range (reference clamps dw/dh/dz/dd to
        # +-|log(16/1000)|, transforms.py:122-131, so extreme pairs are
        # intentionally non-invertible)
        jitter = rng.uniform(-5, 5, (50, 6))
        scale = rng.uniform(0.5, 2.0, (50, 2))
        gts = props + jitter.astype(np.float32)
        gts[:, 2] = gts[:, 0] + np.clip(
            (props[:, 2] - props[:, 0]) * scale[:, 0], 2, None
        )
        gts[:, 3] = gts[:, 1] + np.clip(
            (props[:, 3] - props[:, 1]) * scale[:, 1], 2, None
        )
        gts[:, 5] = gts[:, 4] + np.clip(
            (props[:, 5] - props[:, 4]) * scale[:, 0], 1, None
        )
        gts = gts.astype(np.float32)

        deltas = bbox2delta3d(jnp.asarray(props), jnp.asarray(gts))
        decoded = delta2bbox3d(jnp.asarray(props), deltas)
        np.testing.assert_allclose(np.asarray(decoded), gts, atol=1e-3)

    def test_zero_delta_recovers_proposal(self):
        props = jnp.asarray([[10, 20, 40, 60, 5, 15]], jnp.float32)
        decoded = delta2bbox3d(props, jnp.zeros((1, 6)))
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(props), atol=1e-4
        )

    def test_means_stds_normalisation(self):
        props = jnp.asarray([[0, 0, 20, 20, 0, 10]], jnp.float32)
        gts = jnp.asarray([[2, 2, 26, 26, 1, 13]], jnp.float32)
        means = (0.0,) * 6
        stds = (0.1, 0.1, 0.2, 0.2, 0.1, 0.1)
        d = bbox2delta3d(props, gts, means, stds)
        back = delta2bbox3d(props, d, means, stds)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gts), atol=1e-3)

    def test_clipping_to_volume(self):
        props = jnp.asarray([[0, 0, 20, 20, 0, 10]], jnp.float32)
        big = jnp.asarray([[5.0, 5.0, 3.0, 3.0, 3.0, 3.0]])
        out = delta2bbox3d(props, big, max_shape=(64, 64, 3, 16))
        out = np.asarray(out)
        assert out[..., 0].min() >= 0 and out[..., 2].max() <= 63
        assert out[..., 4].min() >= 0 and out[..., 5].max() <= 15

    def test_multiclass_deltas(self):
        props = jnp.asarray([[0, 0, 20, 20, 0, 10]], jnp.float32)
        deltas = jnp.zeros((1, 12))
        out = delta2bbox3d(props, deltas)
        assert out.shape == (1, 12)
        np.testing.assert_allclose(
            np.asarray(out[:, :6]), np.asarray(out[:, 6:]), atol=1e-5
        )


def test_xyxyzz_to_xywhzd():
    boxes = np.array([[10, 20, 30, 50, 5, 9]], np.float32)
    out = xyxyzz_to_xywhzd(boxes)
    np.testing.assert_allclose(out, [[10, 20, 21, 31, 5, 5]])
