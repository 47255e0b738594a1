# Fast-finetune "1x" schedule: 13 epochs, step LR at epochs [9, 12]
# (reference configs/_dynamic_/schedules/schedule_ft1x.py). Epoch counts
# resolve to iters at runtime via engine/train.py::resolve_epoch_schedule
# (iters_per_epoch = len(dataset) // global_batch).
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-6)
optimizer_config = dict(grad_clip=None)
lr_scaler = dict(policy='linear', base_lr=1.875e-4)
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=1,
    warmup_ratio=0.001,
    warmup_by_epoch=True,
    gamma=0.2,
    step=[9, 12])
total_epochs = 13
