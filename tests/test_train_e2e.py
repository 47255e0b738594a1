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
