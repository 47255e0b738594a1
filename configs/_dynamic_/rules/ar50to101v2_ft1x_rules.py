# Select the best subnet by fast-finetune metric for full finetuning
# (capability parity with reference rules/ar50to101v2_ft1x_rules.py).
model_space_path = 'work_dirs/fastft/fastft_metrics.json'
model_sampling_rules = dict(
    type='sequential',
    rules=[
        dict(
            type='sample',
            operation='top',
            key='metric.fastft_metric.mIoU',
            value=1,
            mode='number'),
    ])
