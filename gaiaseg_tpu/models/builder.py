"""Builders translating mmcv-style config dicts into flax modules.

The config surface is the compatibility contract (SURVEY.md §5): reference
configs declare ``dict(type='DynamicResNet', stem_width=64, ...,
conv_cfg=dict(type='DynConv2d'), norm_cfg=dict(type='DynSyncBN', ...))``.
The TPU rebuild's modules take clean keyword fields; this builder filters a
config to the registered class's dataclass fields, dropping torch-specific
plumbing (conv_cfg/norm_cfg op selection is implicit here: convs are masked
DynConv2d, norms masked sync BN — SURVEY.md §2.10) with a debug log so
nothing disappears silently.
"""
from __future__ import annotations

import copy
import dataclasses
import logging
from typing import Any, Dict, Optional

from ..utils.registry import BACKBONES, HEADS, LOSSES, NECKS, SEGMENTORS

logger = logging.getLogger("gaiaseg_tpu")

# keys that configure torch/mmcv plumbing with no TPU equivalent needed
_IGNORED_KEYS = {
    "conv_cfg", "norm_cfg", "act_cfg", "style", "pretrained", "init_cfg",
    "with_cp", "contract_first_dilation", "zero_init_residual", "num_stages",
    "base_channels", "in_channels",
}


def _build_filtered(registry, cfg: Dict[str, Any], **extra) -> Any:
    cfg = copy.deepcopy(dict(cfg))
    cfg.update(extra)
    obj_type = cfg.pop("type")
    cls = registry.get(obj_type)
    if cls is None:
        raise KeyError(f"{obj_type!r} not registered in {registry.name} "
                       f"(available: {sorted(registry.module_dict)})")
    if dataclasses.is_dataclass(cls):
        fields = {f.name for f in dataclasses.fields(cls)}
        dropped = {k: v for k, v in cfg.items() if k not in fields}
        kept = {k: _freeze(v) for k, v in cfg.items() if k in fields}
        for k in dropped:
            level = logging.DEBUG if k in _IGNORED_KEYS else logging.WARNING
            logger.log(level, "%s: dropping config key %r (no field on %s)",
                       registry.name, k, cls.__name__)
        return cls(**kept)
    return cls(**cfg)


def _freeze(v):
    """Lists in flax module fields must be hashable -> tuples."""
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    return v


def _norm_cfg_extras(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Translate norm_cfg keys that DO have a TPU equivalent.

    ``stat_groups=G`` (our extension of the reference's
    ``dict(type='DynSyncBN', group_size=1)``) selects per-batch-group BN
    statistics — G = number of data-mesh shards reproduces the reference's
    per-device groups exactly (see DynBatchNorm docstring). The reference
    ``group_size`` key alone keeps the default global-sync stats (the
    documented, lower-variance divergence)."""
    nc = cfg.get("norm_cfg")
    if isinstance(nc, dict) and int(nc.get("stat_groups", 1) or 1) > 1:
        return {"bn_groups": int(nc["stat_groups"])}
    return {}


def build_backbone(cfg: Dict[str, Any]):
    return _build_filtered(BACKBONES, cfg, **_norm_cfg_extras(cfg))


def build_head(cfg: Dict[str, Any]):
    return _build_filtered(HEADS, cfg, **_norm_cfg_extras(cfg))


def build_neck(cfg: Dict[str, Any]):
    return _build_filtered(NECKS, cfg)


def build_loss(cfg: Dict[str, Any]):
    return LOSSES.build(dict(cfg))


def build_segmentor(cfg: Dict[str, Any], train_cfg: Optional[Dict] = None,
                    test_cfg: Optional[Dict] = None):
    cfg = copy.deepcopy(dict(cfg))
    if train_cfg is not None:
        cfg["train_cfg"] = train_cfg
    if test_cfg is not None:
        cfg["test_cfg"] = test_cfg
    return _build_filtered(SEGMENTORS, cfg)
