# SegFormer-style elastic supernet (BASELINE.json stretch config):
# ElasticMixViT encoder + SegFormer MLP head.
model = dict(
    type='DynamicEncoderDecoder',
    backbone=dict(
        type='ElasticMixViT',
        widths=(64, 128, 320, 512),
        depths=(3, 4, 6, 3),
        num_heads=(2, 4, 10, 16),
        sr_ratios=(8, 4, 2, 1),
        ffn_ratio10=40,
        out_indices=(0, 1, 2, 3)),
    decode_head=dict(
        type='SegFormerHead',
        in_index=(0, 1, 2, 3),
        input_transform='multiple_select',
        channels=256,
        dropout_ratio=0.1,
        num_classes=19,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='slide', crop_size=(1024, 1024), stride=(768, 768)))

width_range = dict(key='arch.backbone.body.width',
                   start=[32, 64, 160, 256], end=[64, 128, 320, 512],
                   step=[16, 32, 80, 128])
depth_range = dict(key='arch.backbone.body.depth',
                   start=[2, 2, 3, 2], end=[3, 4, 6, 3], step=[1, 1, 1, 1])
MAXS = {'name': 'MAX',
        'arch.backbone.body.width': [64, 128, 320, 512],
        'arch.backbone.body.depth': [3, 4, 6, 3]}
MINS = {'name': 'MIN',
        'arch.backbone.body.width': [32, 64, 160, 256],
        'arch.backbone.body.depth': [2, 2, 3, 2]}

train_sampler = dict(
    type='concat',
    model_samplers=[
        dict(type='anchor', anchors=[MAXS, MINS]),
        dict(type='repeat', times=2, model_sampler=dict(
            type='composite', model_samplers=[
                dict(type='range', **width_range),
                dict(type='range', **depth_range),
            ])),
    ])
val_sampler = dict(type='anchor', anchors=[MINS, MAXS])

optimizer = dict(type='AdamW', lr=6e-5, betas=(0.9, 0.999),
                 weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=1.0))
lr_config = dict(policy='poly', power=1.0, min_lr=0.0, by_epoch=False,
                 warmup='linear', warmup_iters=1500, warmup_ratio=1e-6)
runner = dict(type='IterBasedRunner', max_iters=160000)
checkpoint_config = dict(by_epoch=False, interval=16000)
evaluation = dict(interval=16000, metric='mIoU')
log_config = dict(interval=50)
