# HybridTaskCascade3D — 3-stage cascade with interleaved info-flow mask
# heads and a fused semantic branch, lifted to 6-DoF volumes (reference
# mmdet/models/detectors/htc.py + htc_mask_head.py + fused_semantic_head.py;
# schema mirrors upstream htc configs with the 3-D codec/extractor keys).
model = dict(
    type='HybridTaskCascade3D',
    backbone=dict(
        type='ResNet3D',
        depth=50,
        base_width=16,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        style='pytorch'),
    neck=dict(
        type='FPN3D',
        in_channels=[64, 128, 256, 512],
        out_channels=64,
        num_outs=5),
    rpn_head=dict(
        type='RPNHead3D',
        in_channels=64,
        feat_channels=64,
        anchor_scales=[2],
        anchor_depth_scales=[1],
        anchor_ratios=[1.0],
        anchor_strides=[4, 8, 16, 32, 64],
        anchor_strides_depth=[2, 4, 8, 16, 32],
        target_means=[.0] * 6,
        target_stds=[1.0] * 6,
        use_sigmoid_cls=True),
    bbox_roi_extractor=dict(
        type='SingleRoIExtractor',
        roi_layer=dict(
            type='RoIAlign3D', out_size=7, out_size_depth=3, sample_num=2),
        out_channels=64,
        featmap_strides=[4, 8, 16, 32],
        featmap_strides_depth=[2, 4, 8, 16]),
    bbox_head=dict(
        type='SharedFCBBoxHead',
        num_fcs=2,
        in_channels=64,
        fc_out_channels=1024,
        roi_feat_size=7,
        roi_feat_size_depth=3,
        num_classes=2,
        target_means=[0.] * 6,
        target_stds=[0.1, 0.1, 0.2, 0.2, 0.1, 0.1],
        reg_class_agnostic=True),
    mask_roi_extractor=dict(
        type='SingleRoIExtractor',
        roi_layer=dict(
            type='RoIAlign3D', out_size=14, out_size_depth=10, sample_num=2),
        out_channels=64,
        featmap_strides=[4, 8, 16, 32],
        featmap_strides_depth=[2, 4, 8, 16]),
    mask_head=dict(
        type='HTCMaskHead',
        num_convs=4,
        in_channels=64,
        conv_out_channels=64,
        num_classes=2),
    semantic_roi_extractor=dict(
        type='SingleRoIExtractor',
        roi_layer=dict(
            type='RoIAlign3D', out_size=14, out_size_depth=10, sample_num=2),
        out_channels=64,
        featmap_strides=[8],
        featmap_strides_depth=[4]),
    semantic_head=dict(
        type='FusedSemanticHead',
        num_ins=5,
        fusion_level=1,
        num_convs=4,
        in_channels=64,
        conv_out_channels=64,
        num_classes=2,
        ignore_label=255,
        loss_weight=0.2),
    semantic_fusion=('bbox', 'mask'),
    interleaved=True,
    mask_info_flow=True)
_stage_assigner = dict(
    type='MaxIoUAssigner',
    neg_iou_thr=0.01,
    ignore_iof_thr=-1)
_stage_sampler = dict(
    type='RandomSampler',
    num=256,
    pos_fraction=0.5,
    neg_pos_ub=-1,
    add_gt_as_proposals=True)
train_cfg = dict(
    rpn=dict(
        assigner=dict(
            type='MaxIoUAssigner',
            pos_iou_thr=0.5,
            neg_iou_thr=0.01,
            min_pos_iou=0.01,
            ignore_iof_thr=-1),
        sampler=dict(
            type='RandomSampler',
            num=256,
            pos_fraction=0.5,
            neg_pos_ub=-1,
            add_gt_as_proposals=False),
        allowed_border=0,
        pos_weight=-1,
        smoothl1_beta=1.0 / 9.0,
        debug=False),
    rpn_proposal=dict(
        nms_across_levels=False,
        nms_pre=2000,
        nms_post=2000,
        max_num=2000,
        nms_thr=0.7,
        min_bbox_size=0),
    rcnn=[
        dict(assigner=dict(_stage_assigner, pos_iou_thr=0.3,
                           min_pos_iou=0.3),
             sampler=dict(_stage_sampler),
             mask_size=28, mask_size_depth=20, pos_weight=-1),
        dict(assigner=dict(_stage_assigner, pos_iou_thr=0.4,
                           min_pos_iou=0.4),
             sampler=dict(_stage_sampler),
             mask_size=28, mask_size_depth=20, pos_weight=-1),
        dict(assigner=dict(_stage_assigner, pos_iou_thr=0.5,
                           min_pos_iou=0.5),
             sampler=dict(_stage_sampler),
             mask_size=28, mask_size_depth=20, pos_weight=-1),
    ],
    stage_loss_weights=[1, 0.5, 0.25])
test_cfg = dict(
    rpn=dict(
        nms_across_levels=False,
        nms_pre=2000,
        nms_post=2000,
        max_num=2000,
        nms_thr=0.7,
        min_bbox_size=0),
    rcnn=dict(
        score_thr=0.05,
        nms=dict(type='nms', iou_thr=0.1),
        max_per_img=100,
        mask_thr_binary=0.25),
    keep_all_stages=False,
    return_bbox_only=False)
# dataset settings follow the 3-D family (Coco3DDataset); see
# configs/mask_rcnn_3d_2scales.py for the full data block schema.
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
static_shapes = dict(max_gt=16, crop_size=(128, 128, 64))
optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(
    policy='step', warmup='linear', warmup_iters=10,
    warmup_ratio=1.0 / 3, step=[2500, 3000])
checkpoint_config = dict(interval=5)
log_config = dict(interval=1)
total_epochs = 2000
