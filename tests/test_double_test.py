"""double_test dual-dataset offline protocol (reference tools/test.py:38-73,
results2json3DMulti coco_utils.py:480-574).

Exercises the two-pass merge: pass-2 (1.5x set) boxes are translated to
full-volume coordinates, rescaled into the 1.0x evaluation frame, merged
with pass 1 through the global apply_nms, and evaluated once.
"""
import numpy as np

from mrcnn3d.data.synthetic import (
    make_synthetic_coco3d,
    make_synthetic_coco3d_scaled,
)
from mrcnn3d.eval.coco_eval3d import CocoEval3D
from mrcnn3d.eval.results import results2json3d, results2json3d_multi


def _gt(images, anns):
    return dict(
        images=[dict(id=i, file_name=f"{i}.npy") for i in images],
        annotations=[
            dict(
                id=k + 1,
                image_id=a[0],
                category_id=1,
                iscrowd=0,
                bbox=a[1],
                area=a[1][2] * a[1][3] * a[1][5],
            )
            for k, a in enumerate(anns)
        ],
        categories=[dict(id=1, name="microbleed")],
    )


def _det(x1, y1, x2, y2, z1, z2, s):
    return np.array([[x1, y1, x2, y2, z1, z2, s]], np.float32)


def test_multi_merge_rescales_and_dedups():
    # gt box at [10,10,5,5,3,4] (xywhzd) in the 1.0x frame
    gt = _gt([1], [(1, [10, 10, 5, 5, 3, 4])])
    # pass 1: patch at offset (left=8, top=8, front=2), local det
    infos1 = [dict(id=7, full_volume_id=1, pos_left=8, pos_top=8,
                   pos_front=2)]
    res1 = [[_det(2, 2, 6, 6, 1, 4, 0.9)]]  # global [10,10,14,14,3,6]
    # pass 2: same object seen in the 1.5x set (coords *1.5), no offsets
    infos2 = [dict(id=7, full_volume_id=1)]
    res2 = [[_det(15, 15, 21, 21, 4.5, 9, 0.8)]]

    entries = results2json3d_multi(
        res1, infos1, res2, infos2, scale2=1.0 / 1.5
    )
    # both passes land on the gt box; the 0.1-thr merge NMS keeps one
    assert len(entries) == 1
    assert abs(entries[0]["score"] - 0.9) < 1e-6
    np.testing.assert_allclose(
        entries[0]["bbox"], [10, 10, 5, 5, 3, 4], atol=1e-5
    )
    stats = CocoEval3D(gt, entries).summarize()
    assert stats[0] == 1.0

    # without the merge both survive as duplicates
    raw = results2json3d_multi(
        res1, infos1, res2, infos2, scale2=1.0 / 1.5, merge=False
    )
    assert len(raw) == 2


def test_double_identical_passes_match_single_pass_stats():
    gt = _gt(
        [1, 2],
        [(1, [10, 10, 5, 5, 3, 4]), (2, [40, 12, 8, 6, 10, 6])],
    )
    infos = [dict(id=1), dict(id=2)]
    res = [
        [_det(10, 10, 14, 14, 3, 6, 0.9)],
        [_det(38, 12, 46, 16, 10, 14, 0.7)],
    ]
    single = results2json3d(res, infos)
    double = results2json3d_multi(res, infos, res, infos, scale2=1.0)
    s1 = CocoEval3D(gt, single).summarize()
    s2 = CocoEval3D(gt, double).summarize()
    np.testing.assert_allclose(s1, s2)


def test_synthetic_scaled_twin(tmp_path):
    ann, img_dir = make_synthetic_coco3d(
        str(tmp_path / "base"), num_volumes=1, hw=32, depth=16, seed=3
    )
    ann2, img_dir2 = make_synthetic_coco3d_scaled(
        ann, img_dir, str(tmp_path / "x15"), 1.5
    )
    import json
    import os.path as osp

    base = json.load(open(ann))
    twin = json.load(open(ann2))
    assert twin["images"][0]["id"] == base["images"][0]["id"]
    assert twin["images"][0]["height"] == 48
    vol = np.load(osp.join(img_dir2, twin["images"][0]["file_name"]))
    assert vol.shape == (48, 48, 24)
    b0 = np.array(base["annotations"][0]["bbox"], np.float64)
    b1 = np.array(twin["annotations"][0]["bbox"], np.float64)
    np.testing.assert_allclose(b1, b0 * 1.5)
    # instance-label twin exists and is nearest-upscaled
    seg = np.load(twin["annotations"][0]["segmentation"])
    assert seg.shape == (48, 48, 24)
    assert set(np.unique(seg)) >= {0, 1}
