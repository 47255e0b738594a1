"""Multi-scale flip TTA: pipeline-config parsing drives ``aug_test``
(reference MultiScaleFlipAug img_ratios, pspnet config :76-93)."""
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from gaiaseg_tpu.data.pipeline_cfg import parse_test_pipeline
from gaiaseg_tpu.engine.evaluate import make_eval_step
from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
from gaiaseg_tpu.utils import Config
import pytest

CFG = osp.join(osp.dirname(__file__), "..", "configs", "tests",
               "tiny_synthetic.py")


def test_parse_img_ratios():
    pipe = [dict(type="MultiScaleFlipAug", img_scale=(2048, 1024),
                 img_ratios=[0.5, 0.75, 1.0], flip=True,
                 transforms=[dict(type="Normalize",
                                  mean=[0, 0, 0], std=[1, 1, 1])])]
    p = parse_test_pipeline(pipe)
    assert p.img_ratios == (0.5, 0.75, 1.0)
    assert p.flip and p.img_scale == (2048, 1024)

    # explicit scale list -> ratios vs the largest scale
    pipe2 = [dict(type="MultiScaleFlipAug",
                  img_scale=[(1024, 512), (2048, 1024)], flip=False)]
    p2 = parse_test_pipeline(pipe2)
    assert p2.img_scale == (2048, 1024)
    assert p2.img_ratios == (0.5, 1.0)

    # single scale: no TTA
    p3 = parse_test_pipeline([dict(type="MultiScaleFlipAug",
                                   img_scale=(512, 512))])
    assert p3.img_ratios is None


@pytest.mark.slow  # >15s on the 1-core box
def test_eval_step_multiscale_tta():
    """ratios eval step: runs aug_test over rescaled inputs inside one jit
    program; output confusion matrix is well-formed and a ratio list of
    (1.0,) exactly matches the plain single-scale step."""
    cfg = Config.fromfile(CFG)
    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    arch = encode_arch(model_max_arch(cfg["model"]))
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 32, 32, 3), jnp.bfloat16)
    gt = jax.random.randint(rng, (1, 32, 32), 0, 5)
    variables = model.init({"params": rng, "dropout": rng}, img, gt, arch,
                           method="forward_train")

    plain = make_eval_step(model, 5)
    identity = make_eval_step(model, 5, ratios=(1.0,))
    tta = make_eval_step(model, 5, ratios=(0.5, 1.0))

    cm0 = np.asarray(plain(variables, img, gt, arch))
    cm1 = np.asarray(identity(variables, img, gt, arch))
    cm2 = np.asarray(tta(variables, img, gt, arch))
    np.testing.assert_array_equal(cm0, cm1)
    assert cm2.shape == (5, 5) and cm2.sum() == 32 * 32
