"""ASPP / DeepLabV3+ head tests on the supernet backbone."""
import jax
import jax.numpy as jnp
import numpy as np

from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
import pytest

F32 = jnp.float32
BB = dict(type="DynamicResNet", stem_width=8, body_width=[8, 8, 16, 16],
          body_depth=[1, 1, 1, 1], out_indices=(0, 1, 2, 3),
          strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
          contract_dilation=True, dtype=F32)


def _run(head):
    cfg = dict(type="DynamicEncoderDecoder", backbone=BB, decode_head=head,
               test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    arch = encode_arch(model_max_arch(cfg))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), F32)
    v = model.init(jax.random.PRNGKey(1), x, arch)
    out = model.apply(v, x, arch)
    assert out.shape == (1, 64, 64, 5)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # >15s on the 1-core box
def test_aspp_head():
    _run(dict(type="DynamicASPPHead", in_index=3, channels=16,
              dilations=(1, 2, 4), dropout_ratio=0.0, num_classes=5,
              dtype=F32, loss_decode=dict(type="CrossEntropyLoss")))


@pytest.mark.slow  # >15s-ish on the 1-core box
def test_deeplabv3plus_head():
    _run(dict(type="DepthwiseSeparableASPPHead", in_index=3, channels=16,
              dilations=(1, 2, 4), c1_in_index=0, c1_channels=8,
              dropout_ratio=0.0, num_classes=5, dtype=F32,
              loss_decode=dict(type="CrossEntropyLoss")))
