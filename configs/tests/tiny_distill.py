# Tiny distillation config: DynamicResNet student + frozen BEiT teacher
# over synthetic data — the end-to-end dress rehearsal of the reference's
# teacher->student pipeline (reference dynamic_distiller.py:195-200 teacher
# ckpt load, :370-413 train loop). ``teacher_checkpoint`` is injected via
# --cfg-options by the caller (a converted torch .pth).
_base_ = ['./tiny_synthetic.py']

model = dict(
    type='DynamicDistiller',
    teacher_backbone=dict(
        type='BEiT',
        embed_dim=32,
        depth=2,
        num_heads=2,
        patch_size=8,
        use_rel_pos_bias=True,
        out_indices=(0, 1, 1, 1)),
    teacher_decode_head=dict(
        type='DynamicFCNHead',
        in_index=1,
        channels=8,
        num_convs=1,
        concat_input=False,
        dropout_ratio=0.0,
        num_classes=5),
    distill_cfg=dict(temperature=2.0, distill_weight=1.0,
                     pairwise_weight=0.5))

teacher_checkpoint = None  # set via --cfg-options teacher_checkpoint=...

# 64x64 crops: at 32x32 the student's stage-4 feature is 1x1 spatial and
# the pairwise Gram loss is degenerate (a 1-position Gram is always 1.0)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
crop_size = (64, 64)
data = dict(
    _delete_=True,
    samples_per_gpu=1,
    train=dict(type='SyntheticDataset', length=16, size=(64, 64),
               num_classes=5, cells=2,
               pipeline=[
                   dict(type='Resize', img_scale=(64, 64),
                        ratio_range=(1.0, 1.0)),
                   dict(type='RandomCrop', crop_size=crop_size),
                   dict(type='RandomFlip', prob=0.5),
                   dict(type='Normalize', **img_norm_cfg),
                   dict(type='Pad', size=crop_size, pad_val=0,
                        seg_pad_val=255),
               ]),
    val=dict(type='SyntheticDataset', length=4, size=(64, 64),
             num_classes=5, cells=2, seed=1,
             pipeline=[dict(type='MultiScaleFlipAug', img_scale=(64, 64),
                            flip=False,
                            transforms=[dict(type='Normalize',
                                             **img_norm_cfg)])]),
    test=dict(type='SyntheticDataset', length=4, size=(64, 64),
              num_classes=5, cells=2, seed=1,
              pipeline=[dict(type='MultiScaleFlipAug', img_scale=(64, 64),
                             flip=False,
                             transforms=[dict(type='Normalize',
                                              **img_norm_cfg)])]))
data_cfg = dict(input_shape=(3, 64, 64))

# single fixed arch: each logged step scores the SAME subnet, so the
# distill-loss trajectory is comparable across log lines (sandwich
# sampling would interleave different subnets' losses)
train_sampler = dict(_delete_=True, type='anchor', anchors=[dict(
    name='MAX',
    **{'arch.backbone.stem.width': 16,
       'arch.backbone.body.width': [8, 16, 24, 32],
       'arch.backbone.body.depth': [2, 2, 3, 2]})])

optimizer = dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=0.0001)
runner = dict(type='IterBasedRunner', max_iters=48)
checkpoint_config = dict(interval=48)
evaluation = dict(interval=1000)  # no cross-arch eval in the rehearsal
log_config = dict(interval=8)
