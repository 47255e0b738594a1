"""Analytic FLOPs/params sanity: R50 anchor lands in the reference's
R50-class band and params match the known ResNet-50 count."""
import pytest

from gaiaseg_tpu.archspace.complexity import get_model_complexity_info
from gaiaseg_tpu.models.arch_util import canonical_arch, model_max_arch

SUPERNET = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="DynamicResNet", stem_width=64,
                  body_width=[80, 160, 320, 640],
                  body_depth=[4, 6, 29, 4], out_indices=(0, 1, 2, 3)),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=512,
                     pool_scales=(1, 2, 3, 6), num_classes=19),
    auxiliary_head=dict(type="DynamicFCNHead", in_index=2, channels=256,
                        num_convs=1, concat_input=False, num_classes=19),
)

R50 = {"arch.backbone.stem.width": 64,
       "arch.backbone.body.width": [64, 128, 256, 512],
       "arch.backbone.body.depth": [3, 4, 6, 3]}


def test_r50_backbone_params():
    max_arch = model_max_arch(SUPERNET)
    arch = canonical_arch(max_arch, R50)
    info = get_model_complexity_info(SUPERNET, arch, (3, 224, 224),
                                     only_backbone_flops=True)
    # torchvision resnet50 backbone (no fc): 23.51M params
    assert abs(info["params"] - 23.51e6) / 23.51e6 < 0.01
    # ~4.1 GMacs at 224x224
    assert abs(info["flops"] - 4.1e9) / 4.1e9 < 0.05


def test_r50_fullmodel_flops_band():
    """The reference's rule band is 135-140 GFLOPs at (3,512,2048) for
    R50-class subnets (reference rules/ar50to101v2_rules.py:6)."""
    max_arch = model_max_arch(SUPERNET)
    arch = canonical_arch(max_arch, R50)
    info = get_model_complexity_info(SUPERNET, arch, (3, 512, 2048))
    assert 100e9 < info["flops"] < 400e9  # order-of-magnitude guard
    bb = get_model_complexity_info(SUPERNET, arch, (3, 512, 2048),
                                   only_backbone_flops=True)
    assert bb["flops"] < info["flops"]


def test_complexity_monotonic_in_arch():
    max_arch = model_max_arch(SUPERNET)
    small = canonical_arch(max_arch, {
        "arch.backbone.stem.width": 32,
        "arch.backbone.body.width": [48, 96, 192, 384],
        "arch.backbone.body.depth": [2, 2, 5, 2]})
    big = canonical_arch(max_arch)
    f_small = get_model_complexity_info(SUPERNET, small, (3, 256, 256))
    f_big = get_model_complexity_info(SUPERNET, big, (3, 256, 256))
    assert f_small["flops"] < f_big["flops"]
    assert f_small["params"] < f_big["params"]
