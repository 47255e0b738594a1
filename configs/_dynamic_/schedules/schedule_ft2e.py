# Fast-finetune schedule (~2 epochs; reference schedule_ft2e.py).
optimizer = dict(type='SGD', lr=1.875e-4, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=20))
lr_config = dict(policy='step', step=[1500], gamma=0.2, by_epoch=False)
lr_scaler = dict(policy='linear', base_lr=1.875e-4)
runner = dict(type='IterBasedRunner', max_iters=2000)
checkpoint_config = dict(by_epoch=False, interval=2000)
evaluation = dict(interval=2000, metric='mIoU')
