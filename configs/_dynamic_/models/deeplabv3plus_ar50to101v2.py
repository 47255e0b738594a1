# DeepLabV3+ supernet: DynamicResNet v1c-style dilated backbone + separable
# ASPP head (BASELINE.json config 2: DeepLabV3+ 1024x2048 slide inference).
_base_ = ['./pspnet_ar50to101v2_gsync.py']

model = dict(
    backbone=dict(
        strides=(1, 2, 1, 1),
        dilations=(1, 1, 2, 4),
        contract_dilation=True),
    decode_head=dict(
        _delete_=True,
        type='DepthwiseSeparableASPPHead',
        in_index=3,
        channels=512,
        dilations=(1, 12, 24, 36),
        c1_in_index=0,
        c1_channels=48,
        dropout_ratio=0.1,
        num_classes=19,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    test_cfg=dict(mode='slide', crop_size=(512, 1024), stride=(341, 683)))
