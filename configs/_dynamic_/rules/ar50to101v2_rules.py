# Model-space query rules: R50-class FLOPs band, group by input scale x
# depth bucket, sample 10 per group, merge (capability parity with reference
# configs/_dynamic_/rules/ar50to101v2_rules.py).
model_space_path = 'work_dirs/flops/flops.json'
model_sampling_rules = dict(
    type='sequential',
    rules=[
        dict(func_str="lambda x: 135e9 <= x['overhead.flops'] <= 140e9"),
        dict(
            type='parallel',
            rules=[
                dict(func_str="lambda x: x['data.input_shape'][-1] == 480"),
                dict(func_str="lambda x: x['data.input_shape'][-1] == 560"),
                dict(func_str="lambda x: x['data.input_shape'][-1] == 640"),
                dict(func_str="lambda x: x['data.input_shape'][-1] == 720"),
                dict(func_str="lambda x: x['data.input_shape'][-1] == 800"),
            ]),
        dict(
            type='parallel',
            rules=[
                dict(func_str="lambda x: 11 <= sum(x['arch.backbone.body.depth']) < 17"),
                dict(func_str="lambda x: 18 <= sum(x['arch.backbone.body.depth']) < 24"),
                dict(func_str="lambda x: 25 <= sum(x['arch.backbone.body.depth']) < 31"),
                dict(func_str="lambda x: 32 <= sum(x['arch.backbone.body.depth']) < 38"),
                dict(func_str="lambda x: 39 <= sum(x['arch.backbone.body.depth']) < 44"),
            ]),
        dict(type='sample', operation='random', value=10, mode='number'),
        dict(type='merge'),
    ])
