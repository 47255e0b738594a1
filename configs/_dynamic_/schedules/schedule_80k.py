# 80k-iteration supernet schedule (reference pspnet config :175-180).
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0005)
optimizer_config = dict(grad_clip=dict(max_norm=20))
lr_config = dict(policy='poly', power=0.9, min_lr=1e-4, by_epoch=False)
lr_scaler = dict(policy='linear', base_lr=0.00125)
runner = dict(type='IterBasedRunner', max_iters=80000)
# one device dispatch per sandwich cycle: unrolled 8-step program with
# per-position depth bounds (engine/train.py) — 167 vs 129 img/s/chip on
# v5e; BN stats + loss logs refresh via one full step per log boundary
steps_per_dispatch = 8
checkpoint_config = dict(by_epoch=False, interval=8000)
evaluation = dict(interval=8000, metric='mIoU')
