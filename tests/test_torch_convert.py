"""torch->jax ResNet conversion parity: a small torch bottleneck ResNet's
forward matches our DynamicResNet at the matching anchor after conversion."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaiaseg_tpu.engine.torch_convert import resnet_state_dict_to_params
from gaiaseg_tpu.models import build_backbone
from gaiaseg_tpu.ops.masking import tree_to_ints

# long-running module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

F32 = jnp.float32


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchMiniResNet(tnn.Module):
    """torchvision-layout tiny ResNet: depths [1,1,1,1], planes [4,8,8,8]."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 8, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(8)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBottleneck(8, 4, 1))
        self.layer2 = tnn.Sequential(TorchBottleneck(16, 8, 2))
        self.layer3 = tnn.Sequential(TorchBottleneck(32, 8, 2))
        self.layer4 = tnn.Sequential(TorchBottleneck(32, 8, 2))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            outs.append(x)
        return outs


BB = dict(type="DynamicResNet", stem_width=8,
          body_width=[8, 8, 16, 16],      # MAX wider than the torch net
          body_depth=[2, 1, 2, 1],
          out_indices=(0, 1, 2, 3), dtype=F32)

ANCHOR = {"stem": {"width": 8},
          "body": {"width": [4, 8, 8, 8], "depth": [1, 1, 1, 1]}}


class TorchConvModule(tnn.Module):
    """mmcv ConvModule layout (.conv/.bn children) for key parity."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchPSPHead(tnn.Module):
    """Reference DynamicPSPHead key layout (dynamic_psp_head.py:123-141)."""

    def __init__(self, cin, ch, scales, ncls):
        super().__init__()
        self.psp_modules = tnn.ModuleList(
            tnn.Sequential(tnn.AdaptiveAvgPool2d(s),
                           TorchConvModule(cin, ch, 1)) for s in scales)
        self.bottleneck = TorchConvModule(cin + len(scales) * ch, ch, 3)
        self.conv_seg = tnn.Conv2d(ch, ncls, 1)

    def forward(self, x):
        import torch.nn.functional as F
        outs = [x]
        for m in self.psp_modules:
            outs.append(F.interpolate(m(x), x.shape[2:], mode="bilinear",
                                      align_corners=False))
        return self.conv_seg(self.bottleneck(torch.cat(outs, 1)))


class TorchFCNHead(tnn.Module):
    """Reference DynamicFCNHead key layout (dynamic_fcn_head.py:76-123)."""

    def __init__(self, cin, ch, ncls):
        super().__init__()
        self.convs = tnn.Sequential(TorchConvModule(cin, ch, 3))
        self.conv_cat = TorchConvModule(cin + ch, ch, 3)
        self.conv_seg = tnn.Conv2d(ch, ncls, 1)

    def forward(self, x):
        y = self.convs(x)
        return self.conv_seg(self.conv_cat(torch.cat([x, y], 1)))


class TorchSegmentor(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchMiniResNet()
        self.decode_head = TorchPSPHead(32, 16, (1, 2), 7)
        self.auxiliary_head = TorchFCNHead(32, 16, 7)

    def forward(self, x):
        import torch.nn.functional as F
        feats = self.backbone(x)
        logit = self.decode_head(feats[-1])
        logit = F.interpolate(logit, x.shape[2:], mode="bilinear",
                              align_corners=False)
        return logit, self.auxiliary_head(feats[2])


def _randomize(tmodel):
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.75)


def test_torch_full_segmentor_conversion_parity():
    """Whole-inference logit parity: a reference-layout torch PSPNet (R-mini
    backbone + PSP decode head + FCN aux head) converted into the supernet
    matches torch at the matching anchor — the mIoU-parity evidence for the
    reference load path (tools/extract_subnet.py:91-94)."""
    from gaiaseg_tpu.engine.torch_convert import (
        segmentor_state_dict_to_variables)
    from gaiaseg_tpu.models import build_segmentor, encode_arch, \
        model_max_arch

    tmodel = TorchSegmentor().eval()
    _randomize(tmodel)

    model_cfg = dict(
        type="DynamicEncoderDecoder",
        backbone=dict(BB),
        decode_head=dict(type="DynamicPSPHead", num_classes=7, channels=16,
                         pool_scales=(1, 2), in_index=-1, dropout_ratio=0.1,
                         align_corners=False, dtype=F32),
        auxiliary_head=dict(type="DynamicFCNHead", num_classes=7,
                            channels=16, num_convs=1, concat_input=True,
                            in_index=2, dropout_ratio=0.1, dtype=F32))
    model = build_segmentor(model_cfg)
    max_arch = model_max_arch(model_cfg)
    arch = encode_arch(max_arch, {"backbone": ANCHOR})

    k = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, 32, 32, 3), F32)
    variables = model.init({"params": k, "dropout": k}, img0,
                           jnp.zeros((1, 32, 32), jnp.int32), arch,
                           method="forward_train")
    new_vars = segmentor_state_dict_to_variables(
        tmodel.state_dict(), variables, model_cfg)

    x = np.random.RandomState(1).randn(1, 128, 128, 3).astype(np.float32)
    ours = model.apply(new_vars, jnp.asarray(x), arch)
    bound = model.bind(new_vars)
    feats = bound.extract_feat(jnp.asarray(x), arch)
    ours_aux = bound.aux_heads[0](feats, train=False)

    with torch.no_grad():
        ref, ref_aux = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ours_aux), ref_aux.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-3)
    # argmax (the mIoU-determining quantity) matches everywhere
    assert (np.asarray(ours).argmax(-1) ==
            ref.permute(0, 2, 3, 1).numpy().argmax(-1)).mean() > 0.999


def test_torch_resnet_conversion_parity():
    tmodel = TorchMiniResNet().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.75)

    bb = build_backbone(BB)
    arch = tree_to_ints(ANCHOR)
    x = np.random.RandomState(0).randn(1, 33, 65, 3).astype(np.float32)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x), arch)

    new_p, new_s = resnet_state_dict_to_params(
        tmodel.state_dict(), variables["params"], variables["batch_stats"])
    outs = bb.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), arch, train=False)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    for o, r, w in zip(outs, ref, [16, 32, 32, 32]):
        np.testing.assert_allclose(
            np.asarray(o)[..., :w], r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4)
        assert np.all(np.asarray(o)[..., w:] == 0)
