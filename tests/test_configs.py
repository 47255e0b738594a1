"""Every shipped config parses; every model config builds a segmentor and a
valid max-arch template; samplers/rules build."""
import glob
import os.path as osp

import pytest

from gaiaseg_tpu.archspace import build_model_sampler, build_sample_rule
from gaiaseg_tpu.models import build_segmentor, model_max_arch
from gaiaseg_tpu.utils import Config

ROOT = osp.join(osp.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(glob.glob(osp.join(ROOT, "**", "*.py"), recursive=True))


@pytest.mark.parametrize("path", ALL_CONFIGS,
                         ids=[osp.relpath(p, ROOT) for p in ALL_CONFIGS])
def test_config_loads_and_builds(path):
    cfg = Config.fromfile(path)
    if "model" in cfg:
        model = build_segmentor(cfg["model"])
        assert model is not None
        arch = model_max_arch(cfg["model"])
        assert isinstance(arch, dict)
    for key in ("train_sampler", "val_sampler"):
        if key in cfg:
            s = build_model_sampler(cfg[key])
            meta = s.sample()
            assert isinstance(meta, dict) and meta
    if "model_sampling_rules" in cfg:
        assert build_sample_rule(cfg["model_sampling_rules"]) is not None


def test_pinned_arch_rule_configs_select_their_anchor(tmp_path):
    """r50_s560 / r101_s640 rule configs really pin their named arch+scale
    over a count_flops-shaped model space (reference rules surface,
    configs/_dynamic_/rules/)."""
    import json

    from gaiaseg_tpu.archspace import ModelSpace
    rows = [
        {"arch": {"backbone": {"stem": {"width": 64},
                               "body": {"width": [64, 128, 256, 512],
                                        "depth": [3, 4, 6, 3]}}},
         "data": {"input_shape": [3, 560, 1120]}},
        {"arch": {"backbone": {"stem": {"width": 64},
                               "body": {"width": [64, 128, 256, 512],
                                        "depth": [3, 4, 23, 3]}}},
         "data": {"input_shape": [3, 640, 1280]}},
        {"arch": {"backbone": {"stem": {"width": 32},
                               "body": {"width": [48, 96, 192, 384],
                                        "depth": [2, 2, 5, 2]}}},
         "data": {"input_shape": [3, 560, 1120]}},
    ]
    p = str(tmp_path / "space.json")
    json.dump(rows, open(p, "w"))
    for name, want in (("r50_s560_rules.py", (3, 4, 6, 3)),
                       ("r101_s640_rules.py", (3, 4, 23, 3))):
        cfg = Config.fromfile(osp.join(ROOT, "_dynamic_", "rules", name))
        out = ModelSpace.load(p).apply_rule(
            build_sample_rule(cfg["model_sampling_rules"])).pack()
        assert len(out) == 1, name
        assert tuple(out[0]["arch"]["backbone"]["body"]["depth"]) == want


def test_resolve_epoch_schedule_translates_ft1x():
    """Epoch-denominated schedules (reference schedule_ft1x.py) resolve to
    the iter domain: total_epochs x ipe, step boundaries and warmup scaled
    by iters-per-epoch; iter-based configs pass through untouched."""
    from gaiaseg_tpu.engine.train import resolve_epoch_schedule
    cfg = Config.fromfile(
        osp.join(ROOT, "_dynamic_", "schedules", "schedule_ft1x.py"))
    # cityscapes-train shapes: 2975 imgs, global batch 16 -> ipe 185
    max_iters, lrc = resolve_epoch_schedule(cfg, 2975, 16)
    assert max_iters == 13 * 185
    assert lrc["step"] == [9 * 185, 12 * 185]
    assert lrc["warmup_iters"] == 185
    assert lrc["by_epoch"] is False and "warmup_by_epoch" not in lrc

    it_cfg = {"runner": dict(max_iters=500),
              "lr_config": dict(policy="poly", power=0.9)}
    got, lrc2 = resolve_epoch_schedule(it_cfg, 2975, 16)
    assert got is None and lrc2 == it_cfg["lr_config"]
