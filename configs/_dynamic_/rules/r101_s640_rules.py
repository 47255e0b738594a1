# Pinned-arch selection: the R101 anchor at input scale 640 (capability
# parity with reference configs/_dynamic_/rules/r101_s640_rules.py).
model_space_path = 'work_dirs/flops/flops.json'
model_sampling_rules = dict(
    type='sequential',
    rules=[
        # 1. scale constraint
        dict(
            type='parallel',
            rules=[
                dict(func_str="lambda x: x['data.input_shape'][-2] == 640"),
            ]),
        # 2. arch pins (R101)
        dict(func_str="lambda x: tuple(x['arch.backbone.body.depth']) == (3, 4, 23, 3)"),
        dict(func_str="lambda x: tuple(x['arch.backbone.body.width']) == (64, 128, 256, 512)"),
        dict(func_str="lambda x: x['arch.backbone.stem.width'] == 64"),
        # 3. sample, 4. merge
        dict(type='sample', operation='random', value=1, mode='number'),
        dict(type='merge'),
    ])
