# SSD300 (legacy 2-D mmdet family) — evaluated as depth-1 volumes.
# Mirrors the reference SSD schema (mmdet/models/detectors/single_stage.py
# + anchor_heads/ssd_head.py + backbones/ssd_vgg.py): VGG16 backbone with
# the SSD extra pyramid, no neck, per-level anchor counts, softmax
# classification with 3:1 ranked hard-negative mining.
model = dict(
    type='SSD',
    backbone=dict(
        type='SSDVGG',
        input_size=300,
        depth=16,
        out_indices=(3, 4),
        out_feature_indices=(22, 34),
        l2_norm_scale=20),
    neck=None,
    bbox_head=dict(
        type='SSDHead',
        input_size=300,
        in_channels=(512, 1024, 512, 256, 256, 256),
        num_classes=2,
        anchor_strides=[8, 16, 32, 64, 100, 300],
        anchor_strides_depth=[1, 1, 1, 1, 1, 1],
        basesize_ratio_range=(0.15, 0.9),
        anchor_ratios=([2], [2, 3], [2, 3], [2, 3], [2], [2]),
        target_means=(.0, .0, .0, .0, .0, .0),
        target_stds=(0.1, 0.1, 0.2, 0.2, 0.1, 0.1)))
train_cfg = dict(
    rpn=dict(  # single-stage head cfg (reference keys train_cfg.assigner..)
        assigner=dict(
            type='MaxIoUAssigner',
            pos_iou_thr=0.5,
            neg_iou_thr=0.5,
            min_pos_iou=0.,
            ignore_iof_thr=-1,
            gt_max_assign_all=False),
        smoothl1_beta=1.,
        allowed_border=-1,
        pos_weight=-1,
        neg_pos_ratio=3,
        debug=False))
test_cfg = dict(
    rpn=dict(nms_pre=1000),
    rcnn=dict(
        nms=dict(type='nms', iou_thr=0.45),
        min_bbox_size=0,
        score_thr=0.02,
        max_per_img=16))
# dataset settings follow the 2-D family (Coco2DDataset); omitted here —
# the variant tests drive the model directly.
