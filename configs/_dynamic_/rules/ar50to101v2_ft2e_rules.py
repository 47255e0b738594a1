# Post-eval selection for the ft2e fast-finetune sweep (capability parity
# with reference configs/_dynamic_/rules/ar50to101v2_ft2e_rules.py):
# keep the top-50% subnets by supernet-eval mIoU, group by input scale and
# by total depth band, sample a few per group, merge. (The reference file
# keys on 'metric.coco_bbox_mAP' — a detection vestige; the segmentation
# sweep tags 'metric.metric.mIoU' via tools/test_supernet.py.)
model_space_path = 'work_dirs/test/test_supernet/metrics.json'
model_sampling_rules = dict(
    type='sequential',
    rules=[
        # 1. top 50% by supernet-eval mIoU
        dict(
            type='sample',
            operation='top',
            key='metric.metric.mIoU',
            value=0.5,
            mode='ratio'),
        # 2. input-scale groups
        dict(
            type='parallel',
            rules=[
                dict(func_str="lambda x: x['data.input_shape'][-2] == 480"),
                dict(func_str="lambda x: x['data.input_shape'][-2] == 560"),
                dict(func_str="lambda x: x['data.input_shape'][-2] == 640"),
                dict(func_str="lambda x: x['data.input_shape'][-2] == 720"),
                dict(func_str="lambda x: x['data.input_shape'][-2] == 800"),
            ]),
        # 3. total-depth bands
        dict(
            type='parallel',
            rules=[
                dict(func_str="lambda x: 11 <= sum(x['arch.backbone.body.depth']) < 17"),
                dict(func_str="lambda x: 18 <= sum(x['arch.backbone.body.depth']) < 24"),
                dict(func_str="lambda x: 25 <= sum(x['arch.backbone.body.depth']) < 31"),
                dict(func_str="lambda x: 32 <= sum(x['arch.backbone.body.depth']) < 38"),
                dict(func_str="lambda x: 39 <= sum(x['arch.backbone.body.depth']) < 44"),
            ]),
        # 4. sample per (scale x depth-band) group, 5. merge
        dict(type='sample', operation='random', value=1, mode='number'),
        dict(type='merge'),
    ])
