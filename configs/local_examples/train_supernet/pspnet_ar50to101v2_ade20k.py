# Supernet training on ADE20K crops (BASELINE.json config 3).
_base_ = [
    '../../_dynamic_/models/pspnet_ar50to101v2_gsync.py',
    '../../_dynamic_/datasets/ade20k.py',
    '../../_dynamic_/model_samplers/ar50to101v2.py',
]

model = dict(
    decode_head=dict(num_classes=150),
    auxiliary_head=dict(num_classes=150))

lr_scaler = dict(policy='linear', base_lr=0.00125)
manipulate_arch = True
runner = dict(type='IterBasedRunner', max_iters=160000)
