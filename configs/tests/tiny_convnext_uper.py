# Tiny ConvNeXt + UPerHead supernet on synthetic data (tests/smoke).
model = dict(
    type='DynamicEncoderDecoder',
    backbone=dict(
        type='DynamicConvNeXt',
        dims=(8, 16, 24, 32),
        depths=(2, 2, 3, 2),
        out_indices=(0, 1, 2, 3),
        drop_path_rate=0.1),
    decode_head=dict(
        type='DynamicUPerHead',
        in_index=(0, 1, 2, 3),
        input_transform='multiple_select',
        channels=16,
        pool_scales=(1, 2),
        dropout_ratio=0.1,
        num_classes=5,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    auxiliary_head=dict(
        type='DynamicFCNHead',
        in_index=2,
        channels=8,
        num_convs=1,
        concat_input=False,
        dropout_ratio=0.1,
        num_classes=5,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=0.4)),
    test_cfg=dict(mode='whole'))

body_width_range = dict(key='arch.backbone.body.width',
                        start=[4, 8, 16, 16], end=[8, 16, 24, 32],
                        step=[4, 8, 8, 16])
body_depth_range = dict(key='arch.backbone.body.depth',
                        start=[1, 1, 2, 1], end=[2, 2, 3, 2],
                        step=[1, 1, 1, 1])
MAXN = {'name': 'MAX',
        'arch.backbone.body.width': [8, 16, 24, 32],
        'arch.backbone.body.depth': [2, 2, 3, 2]}

train_sampler = dict(
    type='concat',
    model_samplers=[
        dict(type='anchor', anchors=[MAXN]),
        dict(type='repeat', times=2, model_sampler=dict(
            type='composite',
            model_samplers=[
                dict(type='range', **body_width_range),
                dict(type='range', **body_depth_range),
            ])),
    ])
val_sampler = dict(type='anchor', anchors=[MAXN])

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
crop_size = (32, 32)
train_pipeline = [
    dict(type='Resize', img_scale=(32, 32), ratio_range=(0.8, 1.2)),
    dict(type='RandomCrop', crop_size=crop_size, cat_max_ratio=0.9),
    dict(type='RandomFlip', prob=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
]
test_pipeline = [
    dict(type='MultiScaleFlipAug', img_scale=(32, 32), flip=False,
         transforms=[dict(type='Normalize', **img_norm_cfg)]),
]
data = dict(
    samples_per_gpu=1,
    train=dict(type='SyntheticDataset', length=16, size=(32, 32),
               num_classes=5, cells=2, pipeline=train_pipeline),
    val=dict(type='SyntheticDataset', length=4, size=(32, 32),
             num_classes=5, cells=2, seed=1, pipeline=test_pipeline))

optimizer = dict(type='AdamW', lr=0.001, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=5))
lr_config = dict(policy='poly', power=0.9, min_lr=1e-5)
runner = dict(type='IterBasedRunner', max_iters=8)
checkpoint_config = dict(interval=8)
evaluation = dict(interval=8, metric='mIoU')
log_config = dict(interval=4)
manipulate_arch = True
