# Long supernet schedule: 42 epochs, step LR at epochs [32, 38, 41]
# (reference configs/_dynamic_/schedules/schedule_all_42e.py). Epoch
# counts resolve to iters at runtime via
# engine/train.py::resolve_epoch_schedule.
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0)
optimizer_config = dict(grad_clip=dict(max_norm=20, norm_type=2))
lr_scaler = dict(policy='linear', base_lr=1.25e-3)
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=1,
    warmup_ratio=0.001,
    warmup_by_epoch=True,
    gamma=0.1,
    step=[32, 38, 41])
total_epochs = 42
