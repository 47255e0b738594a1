"""Arch encoding: sampler meta -> traced device arch pytree.

The reference mutates module attributes per subnet
(``model.manipulate_arch(meta['arch'])``, SURVEY.md §2.9 DynamicMixin). Here
``encode_arch`` merges a (possibly partial) meta over the backbone's MAX
template and converts to int32 arrays — the pytree passed as a *traced*
argument into the jitted step, so switching subnets never recompiles.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import jax.numpy as jnp

from .builder import build_backbone
from ..archspace.meta import unfold_dict


def backbone_max_arch(backbone_cfg: Dict[str, Any]) -> Dict[str, Any]:
    bb = build_backbone(backbone_cfg)
    if not hasattr(bb, "max_arch"):
        return {}
    return bb.max_arch()


def model_max_arch(model_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Template for a whole segmentor: only the backbone is elastic in the
    reference space (head/neck manipulators are no-ops, reference
    dynamic_encoder_decoder.py:35-42)."""
    return {"backbone": backbone_max_arch(model_cfg["backbone"])}


def _merge(template: Any, value: Any) -> Any:
    if isinstance(template, dict):
        out = {}
        for k, tv in template.items():
            out[k] = _merge(tv, value.get(k) if isinstance(value, dict) else None)
        return out
    return template if value is None else value


def canonical_arch(max_arch: Dict[str, Any],
                   meta: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Merge a meta's arch over the MAX template -> nested python ints.

    ``meta`` may be a flat dot-keyed sampler draw (``'arch.backbone...'``),
    a nested meta with an ``'arch'`` key, or a bare arch dict.
    """
    if meta is None:
        return copy.deepcopy(max_arch)
    meta = unfold_dict(meta) if any("." in str(k) for k in meta) else meta
    arch = meta.get("arch", meta)
    return _merge(max_arch, arch)


def to_device_arch(arch: Dict[str, Any]) -> Dict[str, Any]:
    def _conv(v):
        if isinstance(v, dict):
            return {k: _conv(x) for k, x in v.items()}
        return jnp.asarray(v, jnp.int32)
    return _conv(arch)


def encode_arch(max_arch: Dict[str, Any],
                meta: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    return to_device_arch(canonical_arch(max_arch, meta))
