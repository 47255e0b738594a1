# Elastic ViT supernet + MultiLevelNeck + UPerHead (the reference pairs
# ElasticTransformer backbones with DynamicMultiLevelNeck + DynamicUPerHead,
# SURVEY.md §2.5/§2.6).
norm_cfg = dict(type='DynSyncBN', group_size=1, requires_grad=True)

model = dict(
    type='DynamicEncoderDecoder',
    backbone=dict(
        type='ElasticTransformer',
        embed_dim=768,
        depth=12,
        num_heads=12,
        ffn_ratio=4.0,
        patch_size=16,
        img_size=512,
        out_indices=(2, 5, 8, 11),
        use_flash=True),
    neck=dict(
        type='DynamicMultiLevelNeck',
        in_channels=[768, 768, 768, 768],
        out_channels=768,
        scales=[4, 2, 1, 0.5]),
    decode_head=dict(
        type='DynamicUPerHead',
        in_channels=[768, 768, 768, 768],
        in_index=(0, 1, 2, 3),
        input_transform='multiple_select',
        pool_scales=(1, 2, 3, 6),
        channels=512,
        dropout_ratio=0.1,
        num_classes=19,
        norm_cfg=norm_cfg,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=dict(
        type='DynamicFCNHead',
        in_channels=768,
        in_index=2,
        channels=256,
        num_convs=1,
        concat_input=False,
        dropout_ratio=0.1,
        num_classes=19,
        norm_cfg=norm_cfg,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=0.4)),
    train_cfg=dict(),
    test_cfg=dict(mode='slide', crop_size=(512, 512), stride=(341, 341)))

# elastic search space: embed width, per-layer depth/heads/ffn
embed_width_range = dict(key='arch.backbone.embedding.width',
                         start=384, end=768, step=192)
depth_range = dict(key='arch.backbone.encoder.depth', start=8, end=12,
                   step=2)
MAXV = {'name': 'MAX',
        'arch.backbone.embedding.width': 768,
        'arch.backbone.encoder.depth': 12}
MINV = {'name': 'MIN',
        'arch.backbone.embedding.width': 384,
        'arch.backbone.encoder.depth': 8}

train_sampler = dict(
    type='concat',
    model_samplers=[
        dict(type='anchor', anchors=[MAXV, MINV]),
        dict(type='repeat', times=2, model_sampler=dict(
            type='composite', model_samplers=[
                dict(type='range', **embed_width_range),
                dict(type='range', **depth_range),
            ])),
    ])
val_sampler = dict(type='anchor', anchors=[MINV, MAXV])

optimizer = dict(type='AdamW', lr=6e-5, betas=(0.9, 0.999),
                 weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=1.0))
lr_config = dict(policy='poly', power=1.0, min_lr=0.0, by_epoch=False,
                 warmup='linear', warmup_iters=1500, warmup_ratio=1e-6)
runner = dict(type='IterBasedRunner', max_iters=160000)
checkpoint_config = dict(by_epoch=False, interval=16000)
evaluation = dict(interval=16000, metric='mIoU')
log_config = dict(interval=50)
