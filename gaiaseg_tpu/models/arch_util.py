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
    execution pays MAX-arch cost (the reference pays subnet-proportional cost
    because blocks beyond ``depth_state`` never run and conv weights are
    physically sliced to the active width,
    reference dynamic_res_layer.py:149-172). ``ArchBounds`` restores
    subnet-proportional compute without giving up the masked design: it is a
    hashable jit-STATIC argument. Depth: blocks at index >= bound do not
    execute at all, while blocks in ``[depth, bound)`` remain traced-masked
    identities. Width: convs/norms execute on the first ``bound`` lanes only
    (prefix slices of the MAX params), with traced widths <= bound masked
    within the slice. Any covered subnet computes the same active-lane
    values (bitwise for depth-only bounds; up to float reduction order once
    widths shrink the contraction dims). One compile serves the whole
    bucket. ``None`` fields mean "no bound" (MAX execution)."""

    body_depth: Optional[Tuple[int, ...]] = None
    body_width: Optional[Tuple[int, ...]] = None   # per-stage mid ("planes")
    stem_width: Optional[int] = None               # bound on the LAST stem conv

    def covers(self, depths=None, widths=None, stem=None) -> bool:
        if self.body_depth is not None and depths is not None and not all(
                int(d) <= int(b) for d, b in zip(depths, self.body_depth)):
            return False
        if self.body_width is not None and widths is not None and not all(
                int(w) <= int(b) for w, b in zip(widths, self.body_width)):
            return False
        if self.stem_width is not None and stem is not None:
            s = max(stem) if isinstance(stem, (list, tuple)) else stem
            if int(s) > int(self.stem_width):
                return False
        return True


def _arch_field(max_arch, meta, section, key):
    arch = canonical_arch(max_arch, meta)
    sec = (arch.get("backbone") or {}).get(section) or {}
    v = sec.get(key)
    if v is None:
        return None
    if not isinstance(v, (list, tuple)):
        v = [v]
    return tuple(int(x) for x in v)


def _body_depth(max_arch: Dict[str, Any],
                meta: Optional[Dict[str, Any]] = None
                ) -> Optional[Tuple[int, ...]]:
    return _arch_field(max_arch, meta, "body", "depth")


def _body_width(max_arch: Dict[str, Any],
                meta: Optional[Dict[str, Any]] = None
                ) -> Optional[Tuple[int, ...]]:
    return _arch_field(max_arch, meta, "body", "width")


def _stem_width(max_arch: Dict[str, Any],
                meta: Optional[Dict[str, Any]] = None) -> Optional[int]:
    sw = _arch_field(max_arch, meta, "stem", "width")
    return max(sw) if sw else None


def exact_bounds(max_arch: Dict[str, Any],
                 meta: Optional[Dict[str, Any]] = None) -> ArchBounds:
    """Bounds that exactly fit one subnet meta (used for anchor archs:
    compile-once-per-anchor, extracted-subnet-like depth AND width cost)."""
    return ArchBounds(body_depth=_body_depth(max_arch, meta),
                      body_width=_body_width(max_arch, meta),
                      stem_width=_stem_width(max_arch, meta))


def _emax_bounds(bs) -> ArchBounds:
    """Elementwise max over ArchBounds (None fields propagate)."""
    def emax(vals):
        vals = [v for v in vals if v is not None]
        if not vals:
            return None
        if isinstance(vals[0], tuple):
            return tuple(max(v[i] for v in vals)
                         for i in range(len(vals[0])))
        return max(vals)

    return ArchBounds(body_depth=emax([b.body_depth for b in bs]),
                      body_width=emax([b.body_width for b in bs]),
                      stem_width=emax([b.stem_width for b in bs]))


def covering_bounds(max_arch: Dict[str, Any], metas) -> ArchBounds:
    """Smallest ArchBounds covering every meta (per-stage elementwise max):
    the right bound for a vmapped population eval, where one program serves
    the whole arch stack."""
    if not metas:
        return exact_bounds(max_arch)
    return _emax_bounds([exact_bounds(max_arch, m) for m in metas])


def cycle_bounds_seq(metas, bucketer) -> Optional[tuple]:
    """Per-position ArchBounds for one K-step dispatch cycle.

    THE single source of truth for the production cycle-variant shape —
    used identically by the train loop (engine/train.py), the benchmark
    (bench.py) and the cache warmer (tools/warmup_cache.py), so the
    programs the warmer precompiles are exactly the programs training
    runs (a drifted re-implementation silently reintroduces the 10-20min
    mid-run relay compiles the warmer exists to prevent).

    Named (anchor) draws keep their exact bucketed bounds; random draws
    share ONE covering bucket (elementwise max over their bounds, snapped
    back to the bucketer's candidate set) — otherwise nearly every cycle
    would draw a fresh ``bounds_seq`` and each distinct sequence is a
    fresh multi-minute compile of the unrolled cycle program. Returns
    ``None`` (caller falls back to MAX execution) when any position has
    no usable bounds."""
    if bucketer is None:
        return None
    bounds = [bucketer(m) for m in metas]
    rnd = [b for b, m in zip(bounds, metas)
           if b is not None and b.body_depth is not None
           and not m.get("name")]
    if rnd:
        cover = _emax_bounds(rnd)
        snap_meta = {"arch.backbone.body.depth": list(cover.body_depth)}
        if cover.body_width is not None:
            snap_meta["arch.backbone.body.width"] = list(cover.body_width)
        if cover.stem_width is not None:
            snap_meta["arch.backbone.stem.width"] = cover.stem_width
        cover = bucketer(snap_meta)
        bounds = [(cover if (b is not None and b.body_depth is not None
                             and not m.get("name")) else b)
                  for b, m in zip(bounds, metas)]
    if any(b is None or b.body_depth is None for b in bounds):
        return None
    return tuple(bounds)


def bounds_arch(max_arch: Dict[str, Any],
                bounds: Optional[ArchBounds]) -> Dict[str, Any]:
    """Nested arch dict whose shapes are what a BOUNDED program executes
    (MAX where unbounded) — masked execution pays the bound's cost, not
    the subnet's, so feeding this to ``get_model_complexity_info`` yields
    EXECUTED FLOPs for MFU accounting (vs nominal FLOPs at the subnet's
    own meta, reference tools/count_flops.py semantics)."""
    arch = canonical_arch(max_arch)
    body = (arch.get("backbone") or {}).get("body")
    stem = (arch.get("backbone") or {}).get("stem")
    if bounds is None or body is None:
        return arch
    if bounds.body_depth is not None:
        body["depth"] = list(bounds.body_depth)
    if bounds.body_width is not None:
        body["width"] = list(bounds.body_width)
    if bounds.stem_width is not None and stem is not None:
        w = stem.get("width")
        stem["width"] = [min(int(x), int(bounds.stem_width)) for x in w] \
            if isinstance(w, (list, tuple)) else \
            min(int(w), int(bounds.stem_width))
    return arch


def make_depth_bucketer(sampler, max_arch: Dict[str, Any],
                        n_levels: int = 4):
    """meta -> ArchBounds with a BOUNDED number of distinct outputs.

    Candidate bounds = every anchor's exact (depth, width, stem) triple
    found in the sampler tree (the sandwich anchors MAX/MIN/R101/R77/R50,
    reference ar50to101v2.py:23-52) + MAX with the single dominant stage
    (largest max depth — stage 3's 29 blocks carry most of the cost)
    quantized to ``n_levels`` depth levels at MAX width for random draws.
    A draw maps to the covering candidate with the smallest estimated
    executed cost (sum of depth_i * width_i^2), so anchors run at
    extracted-subnet cost while jit compiles at most ``#anchors +
    n_levels`` step variants."""
    max_b = exact_bounds(max_arch)
    max_d = max_b.body_depth
    if max_d is None:
        return lambda meta: ArchBounds()

    candidates: List[ArchBounds] = [max_b]

    def walk(s):
        if s is None:
            return
        for a in getattr(s, "anchors", None) or []:
            b = exact_bounds(max_arch, a)
            if b.body_depth is not None and \
                    len(b.body_depth) == len(max_d):
                candidates.append(b)
        for sub in getattr(s, "samplers", None) or []:
            walk(sub)
        walk(getattr(s, "sampler", None))

    walk(sampler)
    # quantize the dominant stage for random (non-anchor) draws; widths
    # stay MAX (a random cycle's covering widths are near-MAX anyway —
    # max-of-3 uniform draws — so width levels would explode the variant
    # count for almost no coverage win)
    dom = max(range(len(max_d)), key=lambda i: max_d[i])
    lo = min(c.body_depth[dom] for c in candidates)
    for k in range(1, n_levels):
        level = lo + (max_d[dom] - lo) * k // n_levels
        t = tuple(max_d[i] if i != dom else int(level)
                  for i in range(len(max_d)))
        candidates.append(max_b._replace(body_depth=t))

    def cost(b: ArchBounds) -> int:
        w = b.body_width or tuple([1] * len(max_d))
        return sum(d * ww * ww for d, ww in zip(b.body_depth, w))

    uniq = sorted(set(candidates), key=lambda b: (cost(b), b))

    def bucket(meta) -> ArchBounds:
        want = exact_bounds(max_arch, meta)
        d = want.body_depth
        if d is None or len(d) != len(max_d):
            return max_b
        for c in uniq:  # smallest-cost covering candidate
            if c.covers(d, want.body_width, want.stem_width):
                return c
        return max_b

    return bucket
