# Tiny synthetic end-to-end config for tests and smoke training.
norm_cfg = dict(type='DynSyncBN', group_size=1)

model = dict(
    type='DynamicEncoderDecoder',
    backbone=dict(
        type='DynamicResNet',
        stem_width=16,
        body_width=[8, 16, 24, 32],
        body_depth=[2, 2, 3, 2],
        out_indices=(0, 1, 2, 3),
        strides=(1, 2, 2, 2),
        norm_cfg=norm_cfg),
    decode_head=dict(
        type='DynamicPSPHead',
        in_index=3,
        channels=16,
        pool_scales=(1, 2),
        dropout_ratio=0.1,
        num_classes=5,
        align_corners=False,
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

stem_width_range = dict(key='arch.backbone.stem.width', start=8, end=16,
                        step=8)
body_width_range = dict(key='arch.backbone.body.width',
                        start=[4, 8, 16, 16], end=[8, 16, 24, 32],
                        step=[4, 8, 8, 16])
body_depth_range = dict(key='arch.backbone.body.depth',
                        start=[1, 1, 2, 1], end=[2, 2, 3, 2],
                        step=[1, 1, 1, 1])
MAXN = {'name': 'MAX',
        'arch.backbone.stem.width': 16,
        'arch.backbone.body.width': [8, 16, 24, 32],
        'arch.backbone.body.depth': [2, 2, 3, 2]}
MINN = {'name': 'MIN',
        'arch.backbone.stem.width': 8,
        'arch.backbone.body.width': [4, 8, 16, 16],
        'arch.backbone.body.depth': [1, 1, 2, 1]}

train_sampler = dict(
    type='concat',
    model_samplers=[
        dict(type='anchor', anchors=[MAXN, MINN]),
        dict(type='repeat', times=2, model_sampler=dict(
            type='composite',
            model_samplers=[
                dict(type='range', **stem_width_range),
                dict(type='range', **body_width_range),
                dict(type='range', **body_depth_range),
            ])),
    ])
val_sampler = dict(type='anchor', anchors=[MINN, MAXN])

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
             num_classes=5, cells=2, seed=1, pipeline=test_pipeline),
    test=dict(type='SyntheticDataset', length=4, size=(32, 32),
              num_classes=5, cells=2, seed=1, pipeline=test_pipeline))

optimizer = dict(type='SGD', lr=0.05, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=20))
lr_config = dict(policy='poly', power=0.9, min_lr=1e-4)
runner = dict(type='IterBasedRunner', max_iters=12)
checkpoint_config = dict(interval=12)
evaluation = dict(interval=12, metric='mIoU')
log_config = dict(interval=4)
manipulate_arch = True
data_cfg = dict(input_shape=(3, 32, 32))
