"""Legacy 2-D dataset family: RGB slice grouping, VOC XML, wrappers."""
import json
import os

import numpy as np
import pytest

from mrcnn3d.data.legacy2d import (
    CocoRGBDataset,
    ConcatDataset,
    RepeatDataset,
    VOCDataset,
)

NORM = dict(mean=[10.0, 10.0, 10.0], std=[2.0, 2.0, 2.0], to_rgb=True)


@pytest.fixture()
def rgb_root(tmp_path):
    img = (np.random.RandomState(0).rand(40, 48, 3) * 255).astype(
        np.uint8
    )
    np.save(tmp_path / "img0.npy", img)
    coco = dict(
        images=[dict(id=1, file_name="img0.npy", width=48, height=40)],
        annotations=[
            dict(id=1, image_id=1, category_id=1,
                 bbox=[4, 4, 10, 12], slice_label="r"),
            dict(id=2, image_id=1, category_id=1,
                 bbox=[20, 8, 8, 8], slice_label="g"),
        ],
        categories=[dict(id=1, name="lesion")],
    )
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(coco))
    return str(ann), str(tmp_path)


def test_coco_rgb_slice_grouping(rgb_root):
    ann, root = rgb_root
    ds = CocoRGBDataset(ann, root, NORM, max_gt=4)
    s = ds[0]
    assert s["imgs"].shape == (1, 64, 64, 3)  # padded to divisor 32
    # r-slice gt present, b-slice empty
    assert s["gt_valid_r"].sum() == 1
    assert s["gt_valid_g"].sum() == 1
    assert s["gt_valid_b"].sum() == 0
    np.testing.assert_allclose(
        s["gt_boxes_r"][0], [4, 4, 13, 15, 0, 0]
    )


@pytest.fixture()
def voc_root(tmp_path):
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    img = (np.random.RandomState(1).rand(30, 30, 3) * 255).astype(
        np.uint8
    )
    # store as npy but keep the .jpg name convention parse-able: write
    # a real npy path by overriding file_name resolution via symlinked
    # name — simplest is to save under the expected name with np.save
    np.save(tmp_path / "JPEGImages" / "000001.jpg.npy", img)
    xml = """<annotation><size><width>30</width><height>30</height>
    <depth>3</depth></size>
    <object><name>dog</name><difficult>0</difficult>
      <bndbox><xmin>5</xmin><ymin>6</ymin><xmax>15</xmax><ymax>18</ymax>
      </bndbox></object>
    <object><name>cat</name><difficult>1</difficult>
      <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>8</xmax><ymax>8</ymax>
      </bndbox></object>
    </annotation>"""
    (tmp_path / "Annotations" / "000001.xml").write_text(xml)
    lst = tmp_path / "train.txt"
    lst.write_text("000001\n")
    return str(lst), str(tmp_path)


def test_voc_xml_parse(voc_root):
    lst, root = voc_root

    class NpyVOC(VOCDataset):
        def prepare_train(self, idx):
            self.img_infos[idx]["file_name"] += ".npy"
            try:
                return super().prepare_train(idx)
            finally:
                self.img_infos[idx]["file_name"] = (
                    self.img_infos[idx]["file_name"][: -len(".npy")]
                )

    ds = NpyVOC(lst, root, NORM, max_gt=4)
    assert len(ds) == 1
    ann = ds.get_ann_info(0)
    assert ann["labels"].tolist() == [VOCDataset.CLASSES.index("dog") + 1]
    np.testing.assert_allclose(ann["bboxes"][0], [4, 5, 14, 17])
    assert ann["bboxes_ignore"].shape == (1, 4)  # difficult cat
    s = ds[0]
    assert s["imgs"].shape == (1, 32, 32, 3)
    assert s["gt_valid"].sum() == 1


def test_concat_and_repeat(rgb_root):
    ann, root = rgb_root
    ds = CocoRGBDataset(ann, root, NORM, max_gt=4)
    cat = ConcatDataset([ds, ds, ds])
    assert len(cat) == 3
    s = cat[2]
    assert s["gt_valid_r"].sum() == 1
    rep = RepeatDataset(ds, 5)
    assert len(rep) == 5
    assert rep[4]["gt_valid_g"].sum() == 1


def test_voc_eval_tool(voc_root, tmp_path, monkeypatch, capsys):
    """tools/voc_eval.py computes per-class AP from saved results."""
    import pickle
    import sys

    lst, root = voc_root
    # perfect detection of the dog box (xyxy -1 applied by the parser)
    dog = VOCDataset.CLASSES.index("dog")
    per_class = [np.zeros((0, 7), np.float32) for _ in VOCDataset.CLASSES]
    per_class[dog] = np.array([[4, 5, 14, 17, 0, 0, 0.9]], np.float32)
    res_file = tmp_path / "results.pkl"
    with open(res_file, "wb") as f:
        pickle.dump([per_class], f)

    sys.path.insert(0, "tools")
    import importlib

    voc_eval = importlib.import_module("voc_eval")
    monkeypatch.setattr(
        sys, "argv",
        ["voc_eval.py", str(res_file), lst, root],
    )
    voc_eval.main()
    out = capsys.readouterr().out
    assert "dog" in out and "mAP" in out
    # the dog AP line shows a perfect 1.0
    dog_line = [ln for ln in out.splitlines() if ln.startswith("dog")][0]
    assert "1.0000" in dog_line
