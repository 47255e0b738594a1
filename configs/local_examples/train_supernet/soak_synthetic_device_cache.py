# Production soak config: flagship supernet on synthetic packed data with
# the device-resident cache — the exact hot path bench.py's e2e-cached
# section times, run long enough (1.5k iters) to prove the loop does not
# wedge and that kill -> resume works (reference 80k-iter IterBasedRunner
# behavior, configs/local_examples/train_supernet/pspnet_ar50to101v2_gsync.py
# :175-180, at a compressed cadence).
#
# Prepare the dataset once (same pack bench.py uses):
#   python - <<'EOF'
#   from gaiaseg_tpu.data.datasets import SyntheticDataset
#   from gaiaseg_tpu.data.packed import pack_dataset
#   pack_dataset(SyntheticDataset(length=64, size=(512, 512),
#                                 num_classes=19, cells=8),
#                "/tmp/gaiaseg_bench_e2e_512.gsegpack")
#   EOF
# Run / kill / resume:
#   python tools/train_supernet.py <this file> --work-dir /tmp/soak
#   (kill mid-run)
#   python tools/train_supernet.py <this file> --work-dir /tmp/soak \
#       --resume-from /tmp/soak/latest.ckpt

_base_ = [
    '../../_dynamic_/models/pspnet_ar50to101v2_gsync.py',
    '../../_dynamic_/model_samplers/ar50to101v2.py',
]

_pack = '/tmp/gaiaseg_bench_e2e_512.gsegpack'
_classes = [f'c{i}' for i in range(19)]
_train_pipeline = [
    dict(type='RandomCrop', crop_size=(512, 512), cat_max_ratio=0.75),
    dict(type='RandomFlip', prob=0.5),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize',
         mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
]

data = dict(
    _delete_=True,
    samples_per_gpu=8,
    train=dict(type='PackedDataset', path=_pack, classes=_classes,
               device_cache=True, pipeline=_train_pipeline),
    val=dict(type='PackedDataset', path=_pack, classes=_classes,
             pipeline=[dict(type='Normalize',
                            mean=[123.675, 116.28, 103.53],
                            std=[58.395, 57.12, 57.375])]),
)

runner = dict(type='IterBasedRunner', max_iters=1500)
checkpoint_config = dict(by_epoch=False, interval=500)
evaluation = dict(interval=500, metric='mIoU')
log_config = dict(interval=48, hooks=[dict(type='TextLoggerHook')])
steps_per_dispatch = 8
# BN running stats feed only the eval hook: refresh them the window
# BEFORE each eval instead of at every log boundary (loss lines read the
# scan cycle's own stacked outputs) — keeps the hot loop inside ONE
# compiled program between evals.
bn_refresh_interval = 496
