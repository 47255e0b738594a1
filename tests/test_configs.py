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
