# Anchor-only traverse sampler for subnet extraction
# (parity with reference configs/_dynamic_/model_samplers/ar50_extract.py).
R50 = {'name': 'R50',
       'arch.backbone.stem.width': 64,
       'arch.backbone.body.width': [64, 128, 256, 512],
       'arch.backbone.body.depth': [3, 4, 6, 3]}
R101 = {'name': 'R101',
        'arch.backbone.stem.width': 64,
        'arch.backbone.body.width': [64, 128, 256, 512],
        'arch.backbone.body.depth': [3, 4, 23, 3]}

train_sampler = dict(type='anchor', anchors=[R50, R101])
