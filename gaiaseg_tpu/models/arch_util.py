"""Arch encoding: sampler meta -> traced device arch pytree.

The reference mutates module attributes per subnet
(``model.manipulate_arch(meta['arch'])``, SURVEY.md §2.9 DynamicMixin). Here
``encode_arch`` merges a (possibly partial) meta over the backbone's MAX
template and converts to int32 arrays — the pytree passed as a *traced*
argument into the jitted step, so switching subnets never recompiles.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

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


class ArchBounds(NamedTuple):
    """STATIC per-stage execution bounds for the bounded fast path.

    The traced arch pytree keeps subnet switching recompile-free, but masked
    execution pays MAX-arch cost (the reference pays depth-proportional cost
    because blocks beyond ``depth_state`` never run,
    reference dynamic_res_layer.py:166-172). ``ArchBounds`` restores
    depth-proportional compute without giving up the masked design: it is a
    hashable jit-STATIC argument — blocks at index >= bound do not execute at
    all, while blocks in ``[depth, bound)`` remain traced-masked identities.
    Any subnet with per-stage depth <= bound runs EXACTLY the same numerics
    on a bound-truncated program; one compile serves the whole bucket.
    ``None`` fields mean "no bound" (full MAX execution, round-1 behavior).
    """

    body_depth: Optional[Tuple[int, ...]] = None

    def covers(self, depths) -> bool:
        if self.body_depth is None:
            return True
        return all(int(d) <= int(b)
                   for d, b in zip(depths, self.body_depth))


def _body_depth(max_arch: Dict[str, Any],
                meta: Optional[Dict[str, Any]] = None
                ) -> Optional[Tuple[int, ...]]:
    arch = canonical_arch(max_arch, meta)
    body = (arch.get("backbone") or {}).get("body") or {}
    d = body.get("depth")
    if d is None:
        return None
    if not isinstance(d, (list, tuple)):
        d = [d]
    return tuple(int(x) for x in d)


def exact_bounds(max_arch: Dict[str, Any],
                 meta: Optional[Dict[str, Any]] = None) -> ArchBounds:
    """Bounds that exactly fit one subnet meta (used for anchor archs:
    compile-once-per-anchor, extracted-subnet-like depth cost)."""
    return ArchBounds(body_depth=_body_depth(max_arch, meta))


def covering_bounds(max_arch: Dict[str, Any], metas) -> ArchBounds:
    """Smallest ArchBounds covering every meta (per-stage elementwise max):
    the right bound for a vmapped population eval, where one program serves
    the whole arch stack."""
    depths = [d for d in (_body_depth(max_arch, m) for m in metas)
              if d is not None]
    if not depths:
        return ArchBounds(body_depth=_body_depth(max_arch))
    return ArchBounds(body_depth=tuple(
        max(d[i] for d in depths) for i in range(len(depths[0]))))


def make_depth_bucketer(sampler, max_arch: Dict[str, Any],
                        n_levels: int = 4):
    """meta -> ArchBounds with a BOUNDED number of distinct outputs.

    Candidate bound tuples = every anchor depth tuple found in the sampler
    tree (the sandwich anchors MAX/MIN/R101/R77/R50,
    reference ar50to101v2.py:23-52) + MAX with the single dominant stage
    (largest max depth — stage 3's 29 blocks carry most of the cost)
    quantized to ``n_levels`` levels for random draws. A draw maps to the
    covering candidate with the smallest total depth, so jit compiles at
    most ``#anchors + n_levels`` step variants, each depth-proportional.
    """
    max_d = _body_depth(max_arch)
    if max_d is None:
        return lambda meta: ArchBounds()

    candidates: List[Tuple[int, ...]] = [max_d]

    def walk(s):
        if s is None:
            return
        for a in getattr(s, "anchors", None) or []:
            d = _body_depth(max_arch, a)
            if d is not None and len(d) == len(max_d):
                candidates.append(d)
        for sub in getattr(s, "samplers", None) or []:
            walk(sub)
        walk(getattr(s, "sampler", None))

    walk(sampler)
    # quantize the dominant stage for random (non-anchor) draws
    dom = max(range(len(max_d)), key=lambda i: max_d[i])
    lo = min(c[dom] for c in candidates)
    for k in range(1, n_levels):
        level = lo + (max_d[dom] - lo) * k // n_levels
        t = tuple(max_d[i] if i != dom else int(level)
                  for i in range(len(max_d)))
        candidates.append(t)
    uniq = sorted(set(candidates), key=lambda t: (sum(t), t))

    def bucket(meta) -> ArchBounds:
        d = _body_depth(max_arch, meta)
        if d is None or len(d) != len(max_d):
            return ArchBounds(body_depth=max_d)
        for c in uniq:  # smallest-total covering candidate
            if all(x <= y for x, y in zip(d, c)):
                return ArchBounds(body_depth=c)
        return ArchBounds(body_depth=max_d)

    return bucket
