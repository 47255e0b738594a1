# Extract ONE hand-specified subnet (parity with reference
# configs/local_examples/extract_subnet/psp_specific_extract.py: a single
# 'RSPECEFIC' anchor pinning stem 32 / widths [48,96,192,384] /
# depths [2,2,4,2]).
_base_ = ['../../_dynamic_/models/pspnet_ar50to101v2_gsync.py']

RSPECIFIC = {'name': 'RSPECIFIC',
             'arch.backbone.stem.width': 32,
             'arch.backbone.body.width': [48, 96, 192, 384],
             'arch.backbone.body.depth': [2, 2, 4, 2]}

train_sampler = dict(type='anchor', anchors=[RSPECIFIC])
data_cfg = dict(input_shape=(3, 512, 1024))
