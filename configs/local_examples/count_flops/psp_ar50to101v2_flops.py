# FLOPs-sweep example (parity with reference count_flops examples).
_base_ = [
    '../../_dynamic_/models/pspnet_ar50to101v2_gsync.py',
    '../../_dynamic_/model_samplers/ar50to101v2_flops.py',
]
data_cfg = dict(input_shape=(3, 512, 2048))
