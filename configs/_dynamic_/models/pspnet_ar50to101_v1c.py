# ResNet-v1c supernet: deep 3-conv stem + contracted dilation, PSP head
# (parity with the model block of reference
# configs/local_examples/extract_subnet/psp_ar50to101_v1c_extract.py:
# deep_stem=True, stem_width=[32,32,64], contract_dilation=True,
# strides (1,2,1,1) with dilations (1,1,2,4) for the 8x output stride).
norm_cfg = dict(type='DynSyncBN', group_size=1, requires_grad=True)
conv_cfg = dict(type='DynConv2d')

model = dict(
    type='DynamicEncoderDecoder',
    backbone=dict(
        type='DynamicResNet',
        stem_width=[32, 32, 64],
        deep_stem=True,
        avg_down=False,
        body_width=[80, 160, 320, 640],
        body_depth=[4, 6, 29, 4],
        num_stages=4,
        dilations=(1, 1, 2, 4),
        strides=(1, 2, 1, 1),
        contract_dilation=True,
        out_indices=(0, 1, 2, 3),
        conv_cfg=conv_cfg,
        norm_cfg=norm_cfg,
        style='pytorch'),
    decode_head=dict(
        type='DynamicPSPHead',
        in_channels=2560,
        in_index=3,
        channels=512,
        pool_scales=(1, 2, 3, 6),
        dropout_ratio=0.1,
        num_classes=19,
        norm_cfg=norm_cfg,
        align_corners=False,
        loss_decode=dict(
            type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0)),
    auxiliary_head=dict(
        type='DynamicFCNHead',
        in_channels=1280,
        in_index=2,
        channels=256,
        num_convs=1,
        concat_input=False,
        dropout_ratio=0.1,
        num_classes=19,
        norm_cfg=norm_cfg,
        align_corners=False,
        loss_decode=dict(
            type='CrossEntropyLoss', use_sigmoid=False, loss_weight=0.4)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
