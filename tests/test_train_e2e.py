"""End-to-end smoke: supernet training on synthetic data over the 8-device
CPU mesh, with the sandwich sampler, checkpointing, cross-arch eval, and
resume (SURVEY.md §4 rebuild strategy: tiny-synthetic end-to-end train)."""
import os.path as osp

import numpy as np
import pytest

from gaiaseg_tpu.engine import train_segmentor, load_checkpoint
from gaiaseg_tpu.models import build_segmentor
from gaiaseg_tpu.utils import Config

CFG = osp.join(osp.dirname(__file__), "..", "configs", "tests",
               "tiny_synthetic.py")


def test_train_supernet_e2e(tmp_path):
    cfg = Config.fromfile(CFG)
    model = build_segmentor(cfg["model"], test_cfg=cfg["model"].get("test_cfg"))
    state, history = train_segmentor(model, cfg,
                                     work_dir=str(tmp_path), seed=0)
    assert int(state.step) == 12
    losses = [h["loss"] for h in history["loss"]]
    assert all(np.isfinite(l) for l in losses)
    # cross-arch eval ran and produced metrics for both anchors
    assert history["eval"], "eval hook did not fire"
    metrics = history["eval"][-1]["metrics"]
    assert set(metrics) == {"MIN", "MAX"}
    for m in metrics.values():
        assert 0.0 <= m["mIoU"] <= 1.0

    # checkpoint was written and is loadable
    ckpt = osp.join(str(tmp_path), "iter_12.ckpt")
    assert osp.exists(ckpt)
    restored, meta = load_checkpoint(ckpt, state)
    assert int(restored.step) == 12
    assert meta["iter"] == 12


def test_frozen_stages_optimizer_mask(tmp_path):
    """frozen_stages=1: stem + layer1 params unchanged after training."""
    import jax.numpy as jnp
    import jax
    cfg = Config.fromfile(CFG)
    cfg["model"]["backbone"]["frozen_stages"] = 1
    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    state, _ = train_segmentor(model, cfg, work_dir=str(tmp_path), seed=0,
                               max_iters=3, val_dataset=None,
                               val_sampler=None)
    # re-init to compare against the starting params (same seed path)
    from gaiaseg_tpu.engine import create_train_state
    from gaiaseg_tpu.engine.optim import (build_lr_schedule,
                                          build_optimizer)
    from gaiaseg_tpu.models import encode_arch, model_max_arch
    tx = build_optimizer(dict(cfg["optimizer"]), None,
                         build_lr_schedule(cfg.get("lr_config"), 0.01, 10))
    init_state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.bfloat16),
        encode_arch(model_max_arch(cfg["model"])), tx)

    def delta(tree_a, tree_b):
        return sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
            jax.tree_util.tree_leaves(tree_a),
            jax.tree_util.tree_leaves(tree_b)))

    bb_new = state.params["backbone_m"]
    bb_old = init_state.params["backbone_m"]
    assert delta(bb_new["stem0"], bb_old["stem0"]) == 0.0
    assert delta(bb_new["layer1"], bb_old["layer1"]) == 0.0
    assert delta(bb_new["layer3"], bb_old["layer3"]) > 0.0
