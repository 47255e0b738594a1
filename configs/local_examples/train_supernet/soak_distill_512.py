# Distillation soak: the DynamicDistiller hot loop at flagship scale
# (BEiT-base-shaped teacher + UPer teacher head over the 512x512 soak
# pipeline, K=8 scan cycle, device-cached feed) for >=512 iters.
# Run by scripts/distill_soak.sh; pass a real converted teacher via
# --cfg-options teacher_checkpoint=/path/to/beit.pth (torch checkpoints
# convert on load — engine/train.py load_teacher_checkpoint; without one
# the teacher keeps fresh init, which exercises the identical compute/
# loss path at zero semantic teacher quality — the strongest evidence
# this image allows, reference dynamic_distiller.py:195-200,341-356).
_base_ = ['./soak_synthetic_512.py']

model = dict(
    type='DynamicDistiller',
    teacher_backbone=dict(
        type='BEiT',
        embed_dim=768,
        depth=12,
        num_heads=12,
        patch_size=16,
        use_rel_pos_bias=True,
        out_indices=(3, 5, 7, 11)),
    teacher_decode_head=dict(
        type='DynamicUPerHead',
        in_index=(0, 1, 2, 3),
        input_transform='multiple_select',
        pool_scales=(1, 2, 3, 6),
        channels=512,
        dropout_ratio=0.0,
        num_classes=19,
        align_corners=False),
    distill_cfg=dict(temperature=2.0, distill_weight=1.0,
                     pairwise_weight=0.5))

runner = dict(type='IterBasedRunner', max_iters=512)
checkpoint_config = dict(interval=512)
evaluation = dict(interval=256, metric='mIoU')
log_config = dict(interval=32)
