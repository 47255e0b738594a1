"""Fast-finetune flow e2e: model space -> rule filter -> anchor-sampler
training -> metric tagging (the tools/finetune_supernet.py core loop)."""
import os.path as osp

import jax
import jax.numpy as jnp

from gaiaseg_tpu.archspace import (ModelSpace, build_model_sampler,
                                   build_sample_rule, fold_dict)
from gaiaseg_tpu.data import SyntheticDataset
from gaiaseg_tpu.engine import evaluate, train_segmentor
from gaiaseg_tpu.models import build_segmentor, encode_arch, model_max_arch
from gaiaseg_tpu.utils import Config
import pytest

# long-running module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = osp.join(osp.dirname(__file__), "..", "configs", "tests",
               "tiny_synthetic.py")


def test_fast_finetune_flow(tmp_path):
    cfg = Config.fromfile(CFG)
    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    max_arch = model_max_arch(cfg["model"])

    # a tiny model space with flops annotations -> rule filter picks one
    metas = [
        {"arch": {"backbone": {"stem": {"width": 8},
                               "body": {"width": [4, 8, 16, 16],
                                        "depth": [1, 1, 2, 1]}}},
         "overhead": {"flops": 1e6}},
        {"arch": {"backbone": {"stem": {"width": 16},
                               "body": {"width": [8, 16, 24, 32],
                                        "depth": [2, 2, 3, 2]}}},
         "overhead": {"flops": 9e6}},
    ]
    space = ModelSpace.load(metas)
    rule = build_sample_rule(dict(
        func_str="lambda x: x['overhead.flops'] < 5e6"))
    selected = space.apply_rule(rule).pack()
    assert len(selected) == 1

    meta = selected[0]
    flat = fold_dict(meta)
    flat["name"] = "ft_target"
    anchor = build_model_sampler(dict(type="anchor", anchors=[flat]))
    state, _ = train_segmentor(model, cfg, work_dir=str(tmp_path),
                               train_sampler=anchor, val_sampler=None,
                               val_dataset=None, max_iters=4)
    assert int(state.step) == 4

    ds = SyntheticDataset(length=4, size=(32, 32), num_classes=5, cells=2,
                          seed=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    metrics = evaluate(model, variables, ds, encode_arch(max_arch, meta),
                       batch_size=2)
    meta.setdefault("metric", {})["fastft_metric"] = metrics
    assert 0.0 <= meta["metric"]["fastft_metric"]["mIoU"] <= 1.0
