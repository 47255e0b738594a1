# FLOPs-sweep sampler: input-scale candidates x arch ranges
# (capability parity with reference ar50to101v2_flops.py).
input_shape_cands = dict(
    key='data.input_shape',
    candidates=(480, 560, 640, 720, 800, 880, 960))
stem_width_range = dict(
    key='arch.backbone.stem.width', start=32, end=64, step=16)
body_width_range = dict(
    key='arch.backbone.body.width',
    start=[48, 96, 192, 384], end=[80, 160, 320, 640],
    step=[16, 32, 64, 128], ascending=True)
body_depth_range = dict(
    key='arch.backbone.body.depth',
    start=[2, 2, 5, 2], end=[4, 6, 29, 4], step=[1, 2, 2, 1])

train_sampler = dict(
    type='composite',
    model_samplers=[
        dict(type='candidate', **input_shape_cands),
        dict(type='range', **stem_width_range),
        dict(type='range', **body_width_range),
        dict(type='range', **body_depth_range),
    ])
