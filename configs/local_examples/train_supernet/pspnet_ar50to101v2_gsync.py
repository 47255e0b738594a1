# Supernet training launch config: model + search space + schedule
# (parity with reference configs/local_examples/train_supernet/
# pspnet_ar50to101v2_gsync.py:1-4 which composes the same _base_ pair).
_base_ = [
    '../../_dynamic_/models/pspnet_ar50to101v2_gsync.py',
    '../../_dynamic_/model_samplers/ar50to101v2.py',
]

# per-sample base LR; apis scale it linearly by the global batch
lr_scaler = dict(policy='linear', base_lr=0.00125)
manipulate_arch = True
