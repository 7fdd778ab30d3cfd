# Single-stage RetinaNet-style 3-D detector (focal loss, no R-CNN stage).
model = dict(
    type='RetinaNet3D',
    backbone=dict(
        type='ResNet3D', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        style='pytorch'),
    neck=dict(
        type='FPN3D', in_channels=[64, 128, 256, 512], out_channels=64,
        num_outs=5),
    rpn_head=dict(  # anchor settings (reference keeps these on bbox_head)
        type='RetinaHead3D',
        in_channels=64,
        feat_channels=64,
        anchor_scales=[2, 3],
        anchor_depth_scales=[2, 3],
        anchor_ratios=[1.0],
        anchor_strides=[4, 8, 16, 32, 64],
        anchor_strides_depth=[2, 4, 8, 16, 32],
        target_means=[.0] * 6,
        target_stds=[1.0] * 6,
        use_sigmoid_cls=True),
    bbox_head=dict(num_classes=2, stacked_convs=4))
train_cfg = dict(
    rpn=dict(
        assigner=dict(
            type='MaxIoUAssigner',
            pos_iou_thr=0.5,
            neg_iou_thr=0.4,
            min_pos_iou=0.0,
            ignore_iof_thr=-1),
        allowed_border=-1,
        gamma=2.0,
        alpha=0.25,
        pos_weight=-1,
        smoothl1_beta=1 / 9.0,
        debug=False))
test_cfg = dict(
    rpn=dict(nms_pre=1000),
    rcnn=dict(
        score_thr=0.05,
        nms=dict(type='nms', iou_thr=0.5),
        max_per_img=100,
        mask_thr_binary=0.5),
    return_bbox_only=True)
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
data = dict(imgs_per_gpu=1, workers_per_gpu=2,
            train=dict(img_norm_cfg=img_norm_cfg),
            val=dict(img_norm_cfg=img_norm_cfg),
            test=dict(img_norm_cfg=img_norm_cfg))
static_shapes = dict(max_gt=16, crop_size=(128, 128, 64))
optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[8, 11])
total_epochs = 12
work_dir = './work_dirs/retinanet_3d'
