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

import jax
import jax.numpy as jnp

from .builder import build_backbone
from ..archspace.meta import unfold_dict


def jit_init(model, rngs, *args, method=None):
    """``model.init`` as ONE jitted program.

    flax's ``Module.init`` executes eagerly — on a relay-attached TPU that
    is thousands of per-op dispatches (~0.65ms RPC floor each) plus one
    eager compile per distinct op: measured ~8 min wall for the flagship
    supernet's init, paid by EVERY process, never persistently cached.
    Jitted, init is a single compiled forward (persistently cached via
    utils/jax_cache.py) and one dispatch."""
    def init_fn(r, *a):
        return model.init(r, *a, method=method)

    return jax.jit(init_fn)(rngs, *args)


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


def cycle_dispatch(metas, bucketer):
    """Per-position dispatch plan for one K-step cycle — THE single source
    of truth for the production cycle program's shape, used identically by
    the train loop (engine/train.py), the benchmark (bench.py) and the
    cache warmer (tools/warmup_cache.py), so the programs the warmer
    precompiles are exactly the programs training runs.

    Named (anchor) draws keep their exact bucketed bounds as STATIC
    entries. Random draws become ONE shared ``BoundsSwitch`` static entry
    (the bucketer's greedy candidate set) plus a per-position runtime
    bucket id — so every random pays its own candidate's sliced cost,
    while the program's compile key (the tuple of static entries) never
    changes across cycles. Returns ``(bounds_seq, bucket_ids)``;
    ``(None, None)`` when any position has no usable bounds (caller falls
    back to MAX execution)."""
    if bucketer is None:
        return None, None
    cands = getattr(bucketer, "rand_candidates", None)
    ridx = getattr(bucketer, "rand_index", None)
    seq, ids = [], []
    for m in metas:
        b = bucketer(m)
        if b is None or b.body_depth is None:
            return None, None
        if m.get("name") or not cands or len(cands) < 2 or ridx is None:
            seq.append(b)
            ids.append(0)
        else:
            seq.append(BoundsSwitch(candidates=tuple(cands)))
            ids.append(int(ridx(m)))
    return tuple(seq), tuple(ids)


def scan_dispatch(metas, bucketer):
    """SCAN-mode dispatch plan for one K-step cycle: ``(candidates, ids)``
    where ``candidates`` is the bucketer's position-independent branch
    table (``scan_candidates``) and ``ids[i]`` is position i's cheapest
    covering branch. Unlike ``cycle_dispatch`` the static part — the
    candidate tuple — does not depend on the cycle's draw order at all,
    so ONE compiled program (a ``lax.scan`` over a ``lax.switch`` body,
    engine/train.py multi_step) serves every cycle, every run, and the
    bench/warmup/train compile keys coincide by construction.
    Returns ``(None, None)`` when the bucketer can't bound the space."""
    if bucketer is None:
        return None, None
    cands = getattr(bucketer, "scan_candidates", None)
    sidx = getattr(bucketer, "scan_index", None)
    if not cands or sidx is None:
        return None, None
    if any(b.body_depth is None for b in cands):
        return None, None
    return tuple(cands), tuple(int(sidx(m)) for m in metas)


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


class BoundsSwitch(NamedTuple):
    """STATIC marker for one cycle position whose bounds are selected at
    RUNTIME: the unrolled cycle program (engine/train.py multi_step) emits
    ``lax.switch(bucket_id, branches)`` over one gradient branch per
    candidate, so every random draw pays its own bucket's sliced cost while
    the program's compile key — this tuple of candidates — stays constant
    across cycles. Replaces the covering-merge strategy (all randoms
    snapped to one shared bucket, which in the ar50to101v2 space collapsed
    to MAX and re-paid the full-width tax the bounds exist to remove)."""

    candidates: Tuple[ArchBounds, ...]


def _rand_bounds_candidates(sampler, max_arch: Dict[str, Any],
                            rand_k: int, n_draws: int = 384,
                            seed: int = 20240817
                            ) -> Tuple[ArchBounds, ...]:
    """Data-driven candidate bounds for RANDOM draws: greedy set of
    ``rand_k`` ArchBounds minimizing the expected executed cost (proxy
    ``stem^2 + sum_i depth_i * width_i^2``) over a deterministic sample of
    the sampler's random region. MAX is always included, so every draw is
    covered. Deterministic across processes (fresh reseeded sampler copy,
    fixed seed) — the candidate tuple is part of the cycle program's
    compile key and must be identical in train/bench/warmup."""
    import numpy as np

    max_b = exact_bounds(max_arch)
    if max_b.body_depth is None or max_b.body_width is None:
        return (max_b,)

    s = copy.deepcopy(sampler)

    def _reseed(node, i=[0]):
        if node is None:
            return
        if hasattr(node, "reseed"):
            node.reseed(seed + i[0])
            i[0] += 1
        for sub in getattr(node, "samplers", None) or []:
            _reseed(sub)
        for sub in getattr(node, "anchors_samplers", None) or []:
            _reseed(sub)
        _reseed(getattr(node, "sampler", None))
        for sub in getattr(node, "model_samplers", None) or []:
            _reseed(sub)

    _reseed(s)

    def vec(b: ArchBounds):
        return np.asarray([b.stem_width or 0] + list(b.body_width)
                          + list(b.body_depth), np.int64)

    draws = []
    for _ in range(n_draws * 2):
        if len(draws) >= n_draws:
            break
        m = s.sample()
        if m.get("name"):
            continue
        b = exact_bounds(max_arch, m)
        if b.body_depth is None or b.body_width is None or \
                len(b.body_depth) != len(max_b.body_depth):
            return (max_b,)
        draws.append(vec(b))
    if not draws:
        return (max_b,)

    D = np.stack(draws)                      # [S, 1+st+st]
    pool_v, seen = [vec(max_b)], {tuple(vec(max_b))}
    for v in D:
        t = tuple(v)
        if t not in seen:
            seen.add(t)
            pool_v.append(v)
    P = np.stack(pool_v)                     # [C, dims]
    ns = len(max_b.body_depth)

    def cost_of(V):
        st, w, d = V[..., 0], V[..., 1:1 + ns], V[..., 1 + ns:]
        return st * st + (d * w * w).sum(axis=-1)

    covers = (P[:, None, :] >= D[None, :, :]).all(-1)   # [C, S]
    pcost = cost_of(P)                                  # [C]
    best = np.full(len(D), pcost[0], np.float64)        # MAX covers all
    chosen = [0]
    for _ in range(max(rand_k, 1) - 1):
        # candidate whose addition lowers expected executed cost the most
        cand_best = np.where(covers, np.minimum(best[None, :],
                                                pcost[:, None]), best)
        gains = best.mean() - cand_best.mean(axis=1)
        j = int(np.argmax(gains))
        if gains[j] <= 0:
            break
        chosen.append(j)
        best = cand_best[j]

    out = [ArchBounds(body_depth=tuple(int(x) for x in P[j][1 + ns:]),
                      body_width=tuple(int(x) for x in P[j][1:1 + ns]),
                      stem_width=int(P[j][0]) or None)
           for j in chosen]
    # ascending cost => stable branch ids + cheapest-covering selection
    return tuple(sorted(set(out), key=lambda b: (
        (b.stem_width or 0) ** 2 + sum(d * w * w for d, w in
                                       zip(b.body_depth, b.body_width)),
        b.body_depth, b.body_width, b.stem_width or 0)))


def make_depth_bucketer(sampler, max_arch: Dict[str, Any],
                        n_levels: int = 4, rand_k: int = 6):
    """meta -> ArchBounds with a BOUNDED number of distinct outputs.

    Candidate bounds = every anchor's exact (depth, width, stem) triple
    found in the sampler tree (the sandwich anchors MAX/MIN/R101/R77/R50,
    reference ar50to101v2.py:23-52) + MAX with the single dominant stage
    (largest max depth — stage 3's 29 blocks carry most of the cost)
    quantized to ``n_levels`` depth levels at MAX width for random draws.
    A draw maps to the covering candidate with the smallest estimated
    executed cost (sum of depth_i * width_i^2), so anchors run at
    extracted-subnet cost while jit compiles at most ``#anchors +
    n_levels`` step variants.

    Additionally exposes ``bucket.rand_candidates`` (a greedy
    expected-cost set of ``rand_k`` bounds over the sampler's random
    region, see _rand_bounds_candidates) and ``bucket.rand_index(meta)``
    — the BoundsSwitch branch table used by ``cycle_dispatch`` so random
    cycle positions pay their own width+depth-proportional cost."""
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
    anchor_bounds = list(candidates)  # MAX + every anchor's exact triple
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
        # None width/stem means "covers every width" (ArchBounds.covers),
        # so it must COST max width too — costing it 1 would sort an
        # unbounded candidate near-cheapest and route every position
        # through its MAX-width branch, silently forfeiting
        # width-proportional compute
        w = b.body_width or max_b.body_width or tuple([1] * len(max_d))
        return sum(d * ww * ww for d, ww in zip(b.body_depth, w))

    def skey(b: ArchBounds):
        # deterministic total-order tie-break that survives None fields
        # (raw namedtuple comparison raises TypeError when a cost tie
        # pits body_width=None against a concrete tuple): None — "covers
        # every width" — sorts AFTER concrete bounds of equal cost, so
        # bucket() prefers the tighter candidate
        return (cost(b), b.body_depth is None, b.body_depth or (),
                b.body_width is None, b.body_width or (),
                b.stem_width is None, b.stem_width or 0)

    uniq = sorted(set(candidates), key=skey)

    def bucket(meta) -> ArchBounds:
        want = exact_bounds(max_arch, meta)
        d = want.body_depth
        if d is None or len(d) != len(max_d):
            return max_b
        for c in uniq:  # smallest-cost covering candidate
            if c.covers(d, want.body_width, want.stem_width):
                return c
        return max_b

    # runtime-selected candidates for RANDOM cycle positions (BoundsSwitch
    # dispatch): greedy expected-cost set, MAX always last-resort cover
    rand_cands = _rand_bounds_candidates(sampler, max_arch, rand_k)

    def rand_index(meta) -> int:
        want = exact_bounds(max_arch, meta)
        d = want.body_depth
        if d is None or len(d) != len(max_d):
            return _rand_max_idx
        for i, c in enumerate(rand_cands):  # sorted ascending by cost
            if c.covers(d, want.body_width, want.stem_width):
                return i
        return _rand_max_idx

    _rand_max_idx = next(
        (i for i, c in enumerate(rand_cands)
         if c.covers(max_b.body_depth, max_b.body_width,
                     max_b.stem_width)), len(rand_cands) - 1)
    bucket.rand_candidates = rand_cands
    bucket.rand_index = rand_index

    # SCAN-mode candidate table: every cycle position (anchor or random)
    # selects its branch at runtime from ONE shared tuple = anchors' exact
    # bounds + the greedy random set, sorted ascending by executed cost.
    # Deterministic across processes (config walk + seeded greedy set), so
    # train / bench / warmup compile the identical program.
    def scost(b: ArchBounds):
        # None fields cover everything (see cost() above): price them at
        # MAX so the ascending sort never prefers an unbounded candidate
        w = b.body_width or max_b.body_width or tuple([1] * len(max_d))
        dd = b.body_depth or max_b.body_depth or tuple([1] * len(w))
        return (sum(d * ww * ww for d, ww in zip(dd, w))
                + (b.stem_width or max_b.stem_width or 0) ** 2)

    scan_cands = tuple(sorted(
        set(anchor_bounds) | set(rand_cands),
        key=lambda b: (scost(b), b.body_depth or (), b.body_width or (),
                       b.stem_width or 0)))
    _scan_max_idx = next(
        (i for i, c in enumerate(scan_cands)
         if c.covers(max_b.body_depth, max_b.body_width, max_b.stem_width)),
        len(scan_cands) - 1)

    def scan_index(meta) -> int:
        """Cheapest covering candidate — for an anchor that is its own
        exact bounds (nothing cheaper can cover it); randoms may land on
        an anchor's bounds when that is cheaper than any random-set
        cover (a strict win over the BoundsSwitch path)."""
        want = exact_bounds(max_arch, meta)
        d = want.body_depth
        if d is None or len(d) != len(max_d):
            return _scan_max_idx
        for i, c in enumerate(scan_cands):
            if c.covers(d, want.body_width, want.stem_width):
                return i
        return _scan_max_idx

    bucket.scan_candidates = scan_cands
    bucket.scan_index = scan_index
    return bucket
