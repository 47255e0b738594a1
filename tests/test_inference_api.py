"""Inference API round trip: train tiny -> save ckpt -> init_segmentor ->
inference_segmentor -> show_result overlay."""
import os.path as osp

import numpy as np

from gaiaseg_tpu.utils import Config
import pytest

CFG = osp.join(osp.dirname(__file__), "..", "configs", "tests",
               "tiny_synthetic.py")


@pytest.mark.slow  # >15s on the 1-core box
def test_inference_roundtrip(tmp_path):
    import jax
    from gaiaseg_tpu.engine import (init_segmentor, inference_segmentor,
                                    save_checkpoint, show_result,
                                    create_train_state)
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    import jax.numpy as jnp

    cfg = Config.fromfile(CFG)
    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    tx = build_optimizer(dict(cfg["optimizer"]), None,
                         build_lr_schedule(cfg.get("lr_config"), 0.01, 10))
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.bfloat16),
        encode_arch(model_max_arch(cfg["model"])), tx)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, {"params": state.params,
                           "batch_stats": state.batch_stats},
                    meta={"CLASSES": ["a", "b", "c", "d", "e"],
                          "PALETTE": [[i * 40, 0, 0] for i in range(5)]})

    seg = init_segmentor(cfg, ckpt)
    assert seg.CLASSES == ["a", "b", "c", "d", "e"]
    img = np.random.RandomState(0).randint(
        0, 255, (32, 32, 3)).astype(np.uint8)
    pred = inference_segmentor(seg, img)
    assert pred.shape == (32, 32) and pred.dtype == np.int32
    assert set(np.unique(pred)) <= set(range(5))

    # subnet-conditioned inference
    pred_sub = inference_segmentor(seg, img, {
        "arch.backbone.body.depth": [1, 1, 2, 1]})
    assert pred_sub.shape == (32, 32)

    out = str(tmp_path / "overlay.png")
    blend = show_result(img, pred, seg.PALETTE, out_file=out)
    assert blend.shape == (32, 32, 3) and osp.exists(out)
