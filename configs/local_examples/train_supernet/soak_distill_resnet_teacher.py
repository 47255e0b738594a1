# Self-distillation soak: a TRAINED supernet (at MAX arch, frozen)
# teaches a fresh student supernet — semantic distillation evidence
# without an external BEiT .pth (the teacher has real task skill:
# scripts/soak_test.sh trains it to ~0.49 anchor mIoU on the synthetic
# set, tools/make_teacher_ckpt.py remaps its subtrees into t_*).
# Mechanism parity with the reference's frozen-teacher hot loop
# (reference dynamic_distiller.py:195-200,264-274,341-356); the teacher
# ARCHITECTURE differs (reference: BEiT) — use
# configs/local_examples/train_supernet/soak_distill_512.py or
# scripts/distill_real_teacher.sh for the BEiT-teacher path.
_base_ = ['./soak_synthetic_512.py']

model = dict(
    type='DynamicDistiller',
    teacher_backbone=dict(
        type='DynamicResNet',
        stem_width=64,
        body_width=[80, 160, 320, 640],
        body_depth=[4, 6, 29, 4],
        out_indices=(0, 1, 2, 3)),
    teacher_decode_head=dict(
        type='DynamicPSPHead', in_index=3, channels=512,
        pool_scales=(1, 2, 3, 6), dropout_ratio=0.0, num_classes=19,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    distill_cfg=dict(temperature=2.0, distill_weight=1.0,
                     pairwise_weight=0.5))

# set via --cfg-options teacher_checkpoint=<make_teacher_ckpt.py output>
teacher_checkpoint = ''

runner = dict(type='IterBasedRunner', max_iters=512)
checkpoint_config = dict(interval=512)
evaluation = dict(interval=256, metric='mIoU')
log_config = dict(interval=32)
