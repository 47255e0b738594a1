# Deep-stem (v1c) subnet extraction example (parity with reference
# configs/local_examples/extract_subnet/psp_ar50to101_v1c_extract.py:
# R50/R77/R101-style anchors over the v1c supernet with 3-list stem
# widths).
_base_ = ['../../_dynamic_/models/pspnet_ar50to101_v1c.py']

R50v1c = {'name': 'R50v1c',
          'arch.backbone.stem.width': [32, 32, 64],
          'arch.backbone.body.width': [64, 128, 256, 512],
          'arch.backbone.body.depth': [3, 4, 6, 3]}
R101v1c = {'name': 'R101v1c',
           'arch.backbone.stem.width': [32, 32, 64],
           'arch.backbone.body.width': [64, 128, 256, 512],
           'arch.backbone.body.depth': [3, 4, 23, 3]}

train_sampler = dict(type='anchor', anchors=[R50v1c, R101v1c])
data_cfg = dict(input_shape=(3, 512, 1024))
