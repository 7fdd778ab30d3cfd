"""Data pipeline tests on a synthetic COCO-3D dataset."""
import numpy as np
import pytest

from mrcnn3d.data.coco3d import Coco3D2ScalesDataset, Coco3DDataset
from mrcnn3d.data.loader import Prefetcher, collate, epoch_indices
from mrcnn3d.data.random_crop3d import RandomCrop3D
from mrcnn3d.data.synthetic import make_synthetic_coco3d
from mrcnn3d.data.transforms import normalize_volume, pad_to_divisor

NORM = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco3d")
    ann_file, img_dir = make_synthetic_coco3d(
        str(root), num_volumes=3, hw=64, depth=16, seed=0
    )
    return ann_file, img_dir


def test_normalize_volume_layout():
    vol = np.full((8, 10, 4), 123.675, np.float32)  # (H, W, D)
    out = normalize_volume(vol, NORM["mean"], NORM["std"])
    assert out.shape == (4, 8, 10, 3)
    assert abs(out[0, 0, 0, 0]) < 1e-5  # (123.675 - mean_r) / std_r == 0


def test_pad_to_divisor():
    vol = np.zeros((5, 30, 33, 3), np.float32)
    out, ori = pad_to_divisor(vol, 32)
    assert out.shape == (5, 32, 64, 3)
    assert ori == (5, 30, 33)


def test_random_crop_keeps_boxes_inside():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 16).astype(np.float32)
    boxes = np.array([[30, 30, 36, 36, 4, 8]], np.float32)
    labels = np.array([1])
    crop = RandomCrop3D(rng=np.random.RandomState(1))
    img_c, boxes_c, labels_c, _ = crop(img, boxes, labels)
    assert img_c.shape == (16, 16, 16)
    assert len(boxes_c) == 1
    b = boxes_c[0]
    assert (b[:4] >= 0).all() and b[2] < 16 and b[3] < 16
    # box extent preserved
    assert b[2] - b[0] == 6 and b[5] - b[4] == 4


def test_random_crop_impossible_returns_none():
    """A gt box larger than the quarter-crop can never satisfy
    containment: the crop must give up (return None -> dataset retries
    another index), not spin forever in a loader worker (the reference's
    extra_aug.py:163 `while True` hangs on such data)."""
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 16).astype(np.float32)
    boxes = np.array([[2, 2, 50, 50, 2, 10]], np.float32)  # 49 > 16 crop
    labels = np.array([1])
    crop = RandomCrop3D(rng=np.random.RandomState(1))
    assert crop(img, boxes, labels) is None


def test_dataset_train_sample(synth):
    ann_file, img_dir = synth
    ds = Coco3DDataset(
        ann_file,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1, 0.3, 0.5))),
        seed=0,
    )
    assert len(ds) == 3
    s = ds[0]
    assert s["imgs"].shape == (16, 32, 32, 3)  # crop 64/4=16 padded to 32
    assert s["gt_boxes"].shape == (8, 6)
    assert s["gt_valid"].any()
    assert s["gt_masks"].shape[0] == 8
    # masks line up with boxes
    i = int(np.flatnonzero(s["gt_valid"])[0])
    assert s["gt_masks"][i].sum() > 0


def test_dataset_2scales(synth):
    ann_file, img_dir = synth
    ds = Coco3D2ScalesDataset(
        ann_file,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1,))),
        seed=0,
        upscale_factor=1.5,
    )
    s = ds[0]
    assert "imgs_2" in s
    # 1.5x twin: 16->24 depth, 16->24 hw padded to 32
    assert s["imgs_2"].shape[0] == 24
    np.testing.assert_allclose(
        s["gt_boxes_2"], s["gt_boxes"] * 1.5, atol=1e-5
    )
    t = ds.prepare_test(0)
    assert t["imgs"].shape == (16, 64, 64, 3)
    assert t["imgs_2"].shape[1] >= 96


def test_loader_prefetch(synth):
    ann_file, img_dir = synth
    ds = Coco3DDataset(
        ann_file,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1,))),
        seed=0,
    )
    batches = list(
        Prefetcher(ds, batch_size=1, epoch=0, device_put=False)
    )
    assert len(batches) == 3
    assert batches[0]["imgs"].shape[0] == 1


def test_epoch_indices_sharding():
    a0 = epoch_indices(10, epoch=0, rank=0, world=2)
    a1 = epoch_indices(10, epoch=0, rank=1, world=2)
    assert len(a0) == len(a1) == 5
    assert set(a0.tolist()) | set(a1.tolist()) == set(range(10))
    # epoch-seeded determinism
    b0 = epoch_indices(10, epoch=0, rank=0, world=2)
    np.testing.assert_array_equal(a0, b0)
    c0 = epoch_indices(10, epoch=1, rank=0, world=2)
    assert not np.array_equal(a0, c0)


def test_loader_process_mode_matches_thread(synth):
    """spawn-based process workers produce the same batches as threads
    for a deterministic (no-aug, unshuffled) dataset."""
    ann_file, img_dir = synth
    ds = Coco3DDataset(ann_file, img_dir, NORM, max_gt=8, seed=0)
    kw = dict(batch_size=1, epoch=0, shuffle=False, device_put=False,
              num_workers=2)
    thread_batches = list(Prefetcher(ds, mode="thread", **kw))
    proc_batches = list(Prefetcher(ds, mode="process", **kw))
    assert len(thread_batches) == len(proc_batches)
    for tb, pb in zip(thread_batches, proc_batches):
        for k in ("imgs", "gt_boxes", "gt_valid", "gt_labels"):
            np.testing.assert_array_equal(tb[k], pb[k])


def test_dataset_parcel(synth, tmp_path):
    """Coco3DParcelDataset: per-instance brain_region labels ride
    through cropping/padding next to gt_labels (reference
    coco_3d_parcel.py:63-107)."""
    import json

    ann_file, img_dir = synth
    d = json.load(open(ann_file))
    for i, a in enumerate(d["annotations"]):
        a["brain_region"] = (i % 14) + 1
    pann = str(tmp_path / "parcel.json")
    json.dump(d, open(pann, "w"))

    from mrcnn3d.data.coco3d import Coco3DParcelDataset

    ds = Coco3DParcelDataset(
        pann,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1, 0.3, 0.5))),
        seed=0,
    )
    s = ds[0]
    assert s["gt_labels"].ndim == 1
    assert s["gt_bregions"].shape == s["gt_labels"].shape
    v = s["gt_valid"]
    assert v.any()
    # surviving instances keep their 1..14 region ids; padding is 0
    assert (s["gt_bregions"][v] >= 1).all()
    assert (s["gt_bregions"][~v] == 0).all()
    # collates into the batch key forward_train consumes
    batch = collate([s])
    assert batch["gt_bregions"].shape == (1, 8)


def test_dataset_3scales(synth):
    """Coco3D3ScalesDataset: 1.0x crop + 1.5x and 2.25x synthesized
    twins with scaled gt (reference coco_3d_3scales.py)."""
    from mrcnn3d.data.coco3d import Coco3D3ScalesDataset

    ann_file, img_dir = synth
    ds = Coco3D3ScalesDataset(
        ann_file,
        img_dir,
        NORM,
        max_gt=8,
        extra_aug=dict(random_crop_3d=dict(min_ious=(0.1,))),
        seed=0,
        upscale_factor=1.5,
    )
    s = ds[0]
    assert "imgs_2" in s and "imgs_3" in s
    # 2.25x twin: crop depth 16 -> 36; crop hw 16 -> 36 padded to divisor
    assert s["imgs_3"].shape[0] == 36
    assert s["imgs_3"].shape[1] >= 36
    np.testing.assert_allclose(
        s["gt_boxes_3"], s["gt_boxes"] * 2.25, atol=1e-5
    )
    np.testing.assert_array_equal(s["gt_valid_3"], s["gt_valid"])
    t = ds.prepare_test(0)
    assert t["imgs_3"].shape[1] >= t["imgs_2"].shape[1]
    assert "ori_shape_3" in t
