# Subnet extraction example (parity with reference
# configs/local_examples/extract_subnet/psp_ar50to101_extract.py).
_base_ = [
    '../../_dynamic_/models/pspnet_ar50to101v2_gsync.py',
    '../../_dynamic_/model_samplers/ar50_extract.py',
]
data_cfg = dict(input_shape=(3, 512, 1024))
