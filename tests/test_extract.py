"""Extraction property test: masked supernet forward at a subnet arch ==
physically-sliced standalone subnet forward (SURVEY.md §3.4 deploy path)."""
import jax
import jax.numpy as jnp
import numpy as np

from gaiaseg_tpu.engine.extract import extract_subnet, subnet_model_cfg
from gaiaseg_tpu.models import (build_segmentor, encode_arch, model_max_arch)
import pytest

F32 = jnp.float32

SUPERNET = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="DynamicResNet", stem_width=8,
                  body_width=[8, 16, 24, 32], body_depth=[2, 2, 3, 2],
                  out_indices=(0, 1, 2, 3), dtype=F32),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=16,
                     pool_scales=(1, 2), dropout_ratio=0.0, num_classes=5,
                     dtype=F32,
                     loss_decode=dict(type="CrossEntropyLoss")),
    auxiliary_head=dict(type="DynamicFCNHead", in_index=2, channels=8,
                        num_convs=1, concat_input=True, dropout_ratio=0.0,
                        num_classes=5, dtype=F32,
                        loss_decode=dict(type="CrossEntropyLoss",
                                         loss_weight=0.4)),
    test_cfg=dict(mode="whole"),
)

META = {"name": "sub",
        "arch.backbone.stem.width": 8,
        "arch.backbone.body.width": [4, 8, 16, 16],
        "arch.backbone.body.depth": [1, 2, 2, 1]}


@pytest.mark.slow  # >15s-ish on the 1-core box
def test_extracted_subnet_matches_masked_supernet():
    model = build_segmentor(SUPERNET)
    k = jax.random.PRNGKey(0)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3), F32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    variables = model.init({"params": k, "dropout": k}, img, gt,
                           encode_arch(model_max_arch(SUPERNET)),
                           method="forward_train")

    sub_cfg, sub_vars, arch = extract_subnet(SUPERNET, variables, META,
                                             img_size=(32, 32))
    assert sub_cfg["backbone"]["body_width"] == [4, 8, 16, 16]
    assert sub_cfg["backbone"]["body_depth"] == [1, 2, 2, 1]

    # masked supernet at the meta
    sup_logit = model.apply(variables, img,
                            encode_arch(model_max_arch(SUPERNET), META))

    sub_model = build_segmentor(sub_cfg)
    sub_logit = sub_model.apply(sub_vars, img,
                                encode_arch(model_max_arch(sub_cfg)))
    np.testing.assert_allclose(np.asarray(sub_logit),
                               np.asarray(sup_logit), rtol=2e-4, atol=2e-4)

    # param count really shrank
    def count(t):
        return sum(x.size for x in jax.tree_util.tree_leaves(t))
    assert count(sub_vars["params"]) < count(variables["params"])


V1C = dict(
    type="DynamicEncoderDecoder",
    backbone=dict(type="DynamicResNet", stem_width=[8, 8, 16],
                  deep_stem=True, contract_dilation=True,
                  body_width=[8, 16, 24, 32], body_depth=[2, 2, 3, 2],
                  strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                  out_indices=(0, 1, 2, 3), dtype=F32),
    decode_head=dict(type="DynamicPSPHead", in_index=3, channels=16,
                     pool_scales=(1, 2), dropout_ratio=0.0, num_classes=5,
                     dtype=F32,
                     loss_decode=dict(type="CrossEntropyLoss")),
    test_cfg=dict(mode="whole"),
)

V1C_META = {"name": "subv1c",
            "arch.backbone.stem.width": [4, 4, 8],
            "arch.backbone.body.width": [4, 8, 16, 16],
            "arch.backbone.body.depth": [1, 2, 2, 1]}


@pytest.mark.slow  # >15s-ish on the 1-core box
def test_extracted_deep_stem_subnet_matches_masked_supernet():
    """v1c (deep 3-conv stem) extraction round-trip: a 3-LIST stem_width
    meta must slice all three stem convs and reproduce the masked supernet
    (reference psp_ar50to101_v1c_extract.py deep_stem=True surface —
    engine/extract.py::subnet_model_cfg assigns stem_width from the arch
    meta, never before covered for the list case)."""
    model = build_segmentor(V1C)
    k = jax.random.PRNGKey(0)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3), F32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    variables = model.init({"params": k, "dropout": k}, img, gt,
                           encode_arch(model_max_arch(V1C)),
                           method="forward_train")

    sub_cfg, sub_vars, _ = extract_subnet(V1C, variables, V1C_META,
                                          img_size=(32, 32))
    assert sub_cfg["backbone"]["stem_width"] == [4, 4, 8]
    assert sub_cfg["backbone"]["deep_stem"] is True

    sup_logit = model.apply(variables, img,
                            encode_arch(model_max_arch(V1C), V1C_META))
    sub_model = build_segmentor(sub_cfg)
    sub_logit = sub_model.apply(sub_vars, img,
                                encode_arch(model_max_arch(sub_cfg)))
    np.testing.assert_allclose(np.asarray(sub_logit),
                               np.asarray(sup_logit), rtol=2e-4, atol=2e-4)
