"""Legacy 2-D dataset family: RGB 2.5-D, VOC/XML, Concat/Repeat.

Host-side ports of the reference's 2-D dataset stack:
  * CocoRGBDataset (mmdet/datasets/coco_rgb.py): one RGB image whose
    channels are adjacent volume slices; annotations carry a
    `slice_label` in {r, g, b} and each slice trains its own head set —
    samples provide gt under _r/_g/_b suffixes.
  * XMLDataset / VOCDataset (xml_style.py, voc.py): VOC-style XML
    annotations (JPEGImages/ + Annotations/), difficult boxes ignored.
  * ConcatDataset / RepeatDataset (concat_dataset.py,
    repeat_dataset.py): composition wrappers.

All produce depth-1 channel-last volumes (1, H, W, 3) with degenerate
z extents [0, 0], matching the 2-D detector family's batch schema.
"""
from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET

import numpy as np

from .transforms import pad_gt

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
    "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def _load_image(path):
    """(H, W, 3) uint8/float image from .npy or a PIL-readable file."""
    if path.endswith(".npy"):
        img = np.load(path, allow_pickle=True)
    else:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img


class _Legacy2DBase:
    """Shared 2-D sample prep: normalize, pad, depth-1 volume + padded gt."""

    def __init__(self, img_norm_cfg, size_divisor=32, max_gt=16,
                 test_mode=False):
        self.img_norm_cfg = img_norm_cfg
        self.size_divisor = size_divisor
        self.max_gt = max_gt
        self.test_mode = test_mode

    def _prep_img(self, img):
        # (H, W, 3) -> normalized depth-1 volume (1, H, W, 3)
        mean = np.asarray(self.img_norm_cfg["mean"], np.float32)
        std = np.asarray(self.img_norm_cfg["std"], np.float32)
        out = (img.astype(np.float32) - mean) / std  # (H, W, 3)
        out = out[None]  # depth-1: (1, H, W, 3)
        pad_h = (-out.shape[1]) % self.size_divisor
        pad_w = (-out.shape[2]) % self.size_divisor
        if pad_h or pad_w:
            out = np.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        return np.ascontiguousarray(out)

    @staticmethod
    def _boxes_2d_to_6dof(boxes):
        """(N, 4) xyxy -> (N, 6) with degenerate z [0, 0]."""
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        z = np.zeros((boxes.shape[0], 2), np.float32)
        return np.concatenate(
            [boxes[:, 0:1], boxes[:, 1:2], boxes[:, 2:3], boxes[:, 3:4],
             z], axis=1,
        )


class CocoRGBDataset(_Legacy2DBase):
    """COCO-json RGB 2.5-D dataset (reference coco_rgb.py:11-132)."""

    def __init__(self, ann_file, img_prefix, img_norm_cfg, **kwargs):
        super().__init__(img_norm_cfg, **kwargs)
        import json

        self.img_prefix = img_prefix
        coco = json.load(open(ann_file))
        self.coco = coco
        self.img_infos = coco["images"]
        self.anns_by_img = {}
        for ann in coco["annotations"]:
            self.anns_by_img.setdefault(ann["image_id"], []).append(ann)
        if not self.test_mode:
            self.img_infos = [
                i for i in self.img_infos if self.anns_by_img.get(i["id"])
            ]

    def __len__(self):
        return len(self.img_infos)

    def _slice_arrays(self, img_id):
        """Per-slice gt grouped by slice_label (reference :62-79)."""
        out = {}
        for key in ("r", "g", "b"):
            anns = [
                a for a in self.anns_by_img.get(img_id, [])
                if a.get("slice_label", "r") == key
            ]
            boxes = np.array(
                [
                    [a["bbox"][0], a["bbox"][1],
                     a["bbox"][0] + a["bbox"][2] - 1,
                     a["bbox"][1] + a["bbox"][3] - 1]
                    for a in anns
                ],
                np.float32,
            ).reshape(-1, 4)
            labels = np.array(
                [a.get("category_id", 1) for a in anns], np.int32
            )
            out[key] = (self._boxes_2d_to_6dof(boxes), labels)
        return out

    def prepare_train(self, idx):
        info = self.img_infos[idx]
        img = _load_image(osp.join(self.img_prefix, info["file_name"]))
        sample = dict(imgs=self._prep_img(img))
        for key, (boxes, labels) in self._slice_arrays(info["id"]).items():
            g = pad_gt(boxes, labels, self.max_gt)
            sample[f"gt_boxes_{key}"] = g["gt_boxes"]
            sample[f"gt_valid_{key}"] = g["gt_valid"]
            sample[f"gt_labels_{key}"] = g["gt_labels"]
        return sample

    def prepare_test(self, idx):
        info = self.img_infos[idx]
        img = _load_image(osp.join(self.img_prefix, info["file_name"]))
        out = self._prep_img(img)
        return dict(
            imgs=out, img_info=info,
            ori_shape=(1, img.shape[0], img.shape[1]),
        )

    def __getitem__(self, idx):
        return (
            self.prepare_test(idx) if self.test_mode
            else self.prepare_train(idx)
        )


class XMLDataset(_Legacy2DBase):
    """VOC-style XML dataset (reference xml_style.py:10-76): ann_file
    lists image ids; JPEGImages/<id>.jpg + Annotations/<id>.xml."""

    CLASSES: tuple = ()

    def __init__(self, ann_file, img_prefix, img_norm_cfg, **kwargs):
        super().__init__(img_norm_cfg, **kwargs)
        self.img_prefix = img_prefix
        self.cat2label = {c: i + 1 for i, c in enumerate(self.CLASSES)}
        with open(ann_file) as f:
            img_ids = [ln.strip() for ln in f if ln.strip()]
        self.img_infos = []
        for img_id in img_ids:
            xml_path = osp.join(
                img_prefix, "Annotations", f"{img_id}.xml"
            )
            root = ET.parse(xml_path).getroot()
            size = root.find("size")
            self.img_infos.append(
                dict(
                    id=img_id,
                    file_name=f"JPEGImages/{img_id}.jpg",
                    width=int(size.find("width").text),
                    height=int(size.find("height").text),
                )
            )

    def __len__(self):
        return len(self.img_infos)

    def get_ann_info(self, idx):
        """bboxes/labels (+ difficult boxes as ignore), reference :32-76."""
        img_id = self.img_infos[idx]["id"]
        xml_path = osp.join(
            self.img_prefix, "Annotations", f"{img_id}.xml"
        )
        root = ET.parse(xml_path).getroot()
        boxes, labels, boxes_ig, labels_ig = [], [], [], []
        for obj in root.findall("object"):
            name = obj.find("name").text
            label = self.cat2label.get(name, 0)
            difficult = int(obj.find("difficult").text)
            bb = obj.find("bndbox")
            box = [
                int(bb.find("xmin").text), int(bb.find("ymin").text),
                int(bb.find("xmax").text), int(bb.find("ymax").text),
            ]
            if difficult:
                boxes_ig.append(box)
                labels_ig.append(label)
            else:
                boxes.append(box)
                labels.append(label)
        boxes = (np.array(boxes, np.float32).reshape(-1, 4) - 1)
        return dict(
            bboxes=boxes,
            labels=np.array(labels, np.int32),
            bboxes_ignore=(
                np.array(boxes_ig, np.float32).reshape(-1, 4) - 1
            ),
            labels_ignore=np.array(labels_ig, np.int32),
        )

    def prepare_train(self, idx):
        info = self.img_infos[idx]
        img = _load_image(osp.join(self.img_prefix, info["file_name"]))
        ann = self.get_ann_info(idx)
        sample = dict(imgs=self._prep_img(img))
        sample.update(
            pad_gt(
                self._boxes_2d_to_6dof(ann["bboxes"]),
                ann["labels"],
                self.max_gt,
            )
        )
        return sample

    def prepare_test(self, idx):
        info = self.img_infos[idx]
        img = _load_image(osp.join(self.img_prefix, info["file_name"]))
        return dict(
            imgs=self._prep_img(img), img_info=info,
            ori_shape=(1, img.shape[0], img.shape[1]),
        )

    def __getitem__(self, idx):
        return (
            self.prepare_test(idx) if self.test_mode
            else self.prepare_train(idx)
        )


class VOCDataset(XMLDataset):
    """Pascal VOC (reference voc.py:4-18)."""

    CLASSES = VOC_CLASSES


class ConcatDataset:
    """Concatenation wrapper (reference concat_dataset.py)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1]) if len(self.datasets) else 0

    def _locate(self, idx):
        ds_idx = int(np.searchsorted(self._offsets, idx, side="right"))
        prev = 0 if ds_idx == 0 else int(self._offsets[ds_idx - 1])
        return self.datasets[ds_idx], idx - prev

    def __getitem__(self, idx):
        ds, i = self._locate(idx)
        return ds[i]

    def prepare_test(self, idx):
        ds, i = self._locate(idx)
        return ds.prepare_test(i)


class RepeatDataset:
    """Epoch-multiplier wrapper (reference repeat_dataset.py)."""

    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    def prepare_test(self, idx):
        return self.dataset.prepare_test(idx % len(self.dataset))
