# Pinned-arch selection: the R50 anchor at input scale 560 (capability
# parity with reference configs/_dynamic_/rules/r50_s560_rules.py —
# NOTE the reference file's body actually pins the R101 depths at scale
# 800, contradicting its own name; this port implements the name's
# intent, the same pinned-arch rule pattern either way).
model_space_path = 'work_dirs/flops/flops.json'
model_sampling_rules = dict(
    type='sequential',
    rules=[
        # 1. scale constraint
        dict(
            type='parallel',
            rules=[
                dict(func_str="lambda x: x['data.input_shape'][-2] == 560"),
            ]),
        # 2. arch pins (R50)
        dict(func_str="lambda x: tuple(x['arch.backbone.body.depth']) == (3, 4, 6, 3)"),
        dict(func_str="lambda x: tuple(x['arch.backbone.body.width']) == (64, 128, 256, 512)"),
        dict(func_str="lambda x: x['arch.backbone.stem.width'] == 64"),
        # 3. sample, 4. merge
        dict(type='sample', operation='random', value=1, mode='number'),
        dict(type='merge'),
    ])
