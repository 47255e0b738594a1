# Distillation supernet: DynamicResNet student + frozen BEiT teacher
# (capability parity with the reference DynamicDistiller setup,
# gaiaseg/models/segmentors/dynamic_distiller.py:151-413).
_base_ = ['./pspnet_ar50to101v2_gsync.py']

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

# teacher weights (converted; see engine/ckpt_surgery.py for resolution
# transfer of rel-pos tables / pos embeddings)
teacher_checkpoint = 'checkpoints/beit_base_upernet_teacher.ckpt'
