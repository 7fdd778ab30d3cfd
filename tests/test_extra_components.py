"""Soft-NMS, proposal recall, and alternative backbones."""
import jax
import jax.numpy as jnp
import numpy as np

from mrcnn3d.eval.recall import eval_recalls_3d
from mrcnn3d.models.backbones_extra import ResNeXt3D, UNet3D
from mrcnn3d.ops.nms3d import nms_3d_numpy, soft_nms_3d_numpy


class TestSoftNms:
    def test_gaussian_decays_but_keeps(self):
        box = [10, 10, 30, 30, 2, 8]
        dets = np.array([box + [0.9], box + [0.8]], np.float32)
        out, idx = soft_nms_3d_numpy(dets, method="gaussian", sigma=0.5)
        assert idx[0] == 0
        # overlapping duplicate survives with decayed score
        assert len(out) == 2
        assert out[1, 6] < 0.8

    def test_naive_matches_hard_nms(self):
        rng = np.random.RandomState(0)
        x1 = rng.uniform(0, 40, 20)
        dets = np.stack(
            [
                x1,
                x1,
                x1 + 10,
                x1 + 10,
                np.zeros(20),
                np.full(20, 5.0),
                rng.uniform(0, 1, 20),
            ],
            axis=-1,
        ).astype(np.float32)
        _, idx = soft_nms_3d_numpy(dets, iou_thr=0.5, method="naive")
        assert sorted(idx) == sorted(nms_3d_numpy(dets, 0.5))


class TestRecall:
    def test_perfect_proposals(self):
        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        props = [np.array([[10, 10, 20, 20, 2, 8, 0.9]], np.float32)]
        r = eval_recalls_3d(gts, props, (1, 10), (0.5, 0.9))
        np.testing.assert_allclose(r, 1.0)

    def test_topk_cutoff(self):
        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        # good proposal ranked second
        props = [
            np.array(
                [
                    [100, 100, 120, 120, 0, 5, 0.9],
                    [10, 10, 20, 20, 2, 8, 0.5],
                ],
                np.float32,
            )
        ]
        r = eval_recalls_3d(gts, props, (1, 2), (0.5,))
        assert r[0, 0] == 0.0 and r[1, 0] == 1.0


class TestBackbones:
    def test_unet3d_shapes(self):
        m = UNet3D(base_channels=4)
        x = jnp.zeros((1, 8, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert len(outs) == 4
        assert outs[0].shape == (1, 8, 32, 32, 4)  # finest
        assert outs[-1].shape == (1, 1, 4, 4, 32)  # coarsest

    def test_resnext3d_shapes(self):
        m = ResNeXt3D(depth=50, groups=4, base_width=4, width=8)
        x = jnp.zeros((1, 8, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert len(outs) == 4
        # strides xy {4,8,16,32}, depth {2,4,8,16}; widths 32..256
        assert outs[0].shape == (1, 4, 8, 8, 32)
        assert outs[3].shape == (1, 1, 1, 1, 256)


class TestVocMap:
    def test_perfect(self):
        from mrcnn3d.eval.mean_ap import eval_map_3d

        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        dets = [np.array([[10, 10, 20, 20, 2, 8, 0.9]], np.float32)]
        ap, r, p = eval_map_3d(dets, gts)
        assert ap == 1.0

    def test_fp_before_tp(self):
        from mrcnn3d.eval.mean_ap import eval_map_3d

        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        dets = [
            np.array(
                [
                    [100, 100, 110, 110, 0, 4, 0.95],
                    [10, 10, 20, 20, 2, 8, 0.9],
                ],
                np.float32,
            )
        ]
        ap, r, p = eval_map_3d(dets, gts)
        # recall 1 at precision 0.5 -> continuous AP 0.5
        assert abs(ap - 0.5) < 1e-6

    def test_11point_mode(self):
        from mrcnn3d.eval.mean_ap import eval_map_3d

        gts = [np.array([[10, 10, 20, 20, 2, 8]], np.float32)]
        dets = [np.array([[10, 10, 20, 20, 2, 8, 0.9]], np.float32)]
        ap, _, _ = eval_map_3d(dets, gts, mode="11points")
        assert abs(ap - 1.0) < 1e-6
