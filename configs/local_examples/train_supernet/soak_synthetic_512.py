# Production soak configuration: the flagship supernet train loop at real
# shapes (512x512 crops, batch 8, steps_per_dispatch=8, device-cached
# dataset, checkpoint + cross-arch eval at a real cadence) over a packed
# synthetic dataset. Used by scripts/soak_test.sh to prove the production
# loop runs long, survives a mid-run kill, and resumes to max_iters —
# the behavior the reference's 80k-iter IterBasedRunner provides
# (reference configs/local_examples/train_supernet/
# pspnet_ar50to101v2_gsync.py:175-180).
_base_ = [
    '../../_dynamic_/models/pspnet_ar50to101v2_gsync.py',
    '../../_dynamic_/model_samplers/ar50to101v2.py',
]

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
crop_size = (512, 512)
train_pipeline = [
    dict(type='RandomCrop', crop_size=crop_size, cat_max_ratio=0.75),
    dict(type='RandomFlip', prob=0.5),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', **img_norm_cfg),
]
test_pipeline = [
    dict(type='MultiScaleFlipAug', img_scale=(512, 512), flip=False,
         transforms=[dict(type='Normalize', **img_norm_cfg)]),
]

data = dict(
    samples_per_gpu=8,
    train=dict(type='PackedDataset',
               # created by scripts/soak_test.sh (pack of a 64-image
               # SyntheticDataset at 512x512, 19 classes)
               path='/tmp/gaiaseg_soak_512.gsegpack',
               classes=[f'c{i}' for i in range(19)],
               device_cache=True,
               pipeline=train_pipeline),
    val=dict(type='SyntheticDataset', length=4, size=(512, 512),
             num_classes=19, cells=8, seed=1, pipeline=test_pipeline))

optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=20))
lr_config = dict(policy='poly', power=0.9)
runner = dict(type='IterBasedRunner', max_iters=1536)
steps_per_dispatch = 8
checkpoint_config = dict(interval=512)
evaluation = dict(interval=768, metric='mIoU')
log_config = dict(interval=64)
manipulate_arch = True
auto_resume = True
