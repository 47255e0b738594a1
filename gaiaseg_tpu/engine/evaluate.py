"""Evaluation loops: single-subnet eval + cross-architecture eval.

Capability parity with the reference eval stack (SURVEY.md §2.1 test.py,
§2.2 cross_arch_eval_hooks.py): iterate the val set, whole- or slide-mode
inference, optional flip TTA, mIoU via confusion matrix;
``cross_arch_evaluate`` re-runs the val set for every sampler anchor
(R50/R77/R101) — the supernet-health integration test (SURVEY.md §4 item 2).

TPU redesign: predictions never leave the device (confusion matrix
accumulates on-chip), and switching subnets is a traced-arch swap with zero
recompiles, which is what makes the >=500 subnets/hr target reachable.
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..data.loader import BatchLoader, device_prefetch
from ..data.metrics import SegEvaluator, confusion_matrix
from ..data.pipeline_cfg import TestPipelineParams
from ..data.transforms import prepare_eval_batch
from ..models.arch_util import encode_arch, exact_bounds

logger = logging.getLogger("gaiaseg_tpu")


def make_eval_step(model, num_classes: int, flip: bool = False,
                   ratios=None):
    """jitted: (variables, img, gt, arch[, bounds]) -> [C,C] confusion
    matrix. ``bounds`` (STATIC ArchBounds) selects the depth-proportional
    program for that bucket — None keeps the single-compile MAX program.
    ``ratios`` (MultiScaleFlipAug img_ratios) turns the step into
    multi-scale TTA via ``aug_test`` — all scales run inside ONE program
    (bilinear rescale commutes with per-channel normalization, so rescaling
    the normalized batch on-device is exact)."""
    ratios = tuple(float(r) for r in ratios) if ratios else None
    if ratios == (1.0,):
        ratios = None

    @functools.partial(jax.jit, static_argnames=("bounds",))
    def step(variables, img, gt, arch, bounds=None):
        if ratios:
            from ..ops.resize import resize_bilinear
            h, w = img.shape[1:3]
            imgs = [img if abs(r - 1.0) < 1e-6 else
                    resize_bilinear(img, (max(int(round(h * r)), 1),
                                          max(int(round(w * r)), 1)), False)
                    for r in ratios]
            pred = model.apply(variables, imgs, arch, flip, bounds,
                               method=model.aug_test, out_hw=(h, w))
        else:
            pred = model.apply(variables, img, arch, flip, bounds,
                               method=model.simple_test)
        return confusion_matrix(pred, gt, num_classes)

    return step


def evaluate(model, variables, dataset, arch, *,
             test_params: Optional[TestPipelineParams] = None,
             batch_size: int = 1, flip: bool = False,
             eval_step=None, max_batches: Optional[int] = None,
             bounds=None) -> Dict[str, float]:
    test_params = test_params or TestPipelineParams()
    num_classes = model.num_classes
    if eval_step is None:
        eval_step = make_eval_step(model, num_classes, flip,
                                   ratios=getattr(test_params, "img_ratios",
                                                  None))
    mean = jnp.asarray(test_params.mean)
    std = jnp.asarray(test_params.std)
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    # shard the val set across processes (reference multi_gpu_test splits
    # by rank, apis/test.py:68-109) — each process sweeps its slice, then
    # the integer confusion matrices are summed host-side (the TPU analog
    # of collect_results_*: the CM is the entire eval state, a [C,C] int
    # array, so the gather is trivial and exact)
    # device-cached val sets skip pixel batches: ONE fused program does
    # row-gather + normalize + tail masking (see gather_augment_batch —
    # split gather/prep dispatches pay the relay's per-program floor twice
    # plus an extra HBM round-trip of the batch)
    from ..data.device_cache import DeviceCachedDataset
    from ..data.transforms import gather_prepare_eval_batch
    _cache = dataset if isinstance(dataset, DeviceCachedDataset) else None
    loader = BatchLoader(dataset, batch_size, shuffle=False, drop_last=False,
                         shard_id=jax.process_index(),
                         num_shards=jax.process_count(),
                         index_only=_cache is not None)
    def prep(batch):
        pad = batch.get("pad_count", 0)
        if _cache is not None:
            img, gt = gather_prepare_eval_batch(
                _cache._imgs, _cache._gts, jnp.asarray(batch["idx"]),
                mean, std, jnp.asarray(pad, jnp.int32))
            return img, gt, pad
        img = prepare_eval_batch(jnp.asarray(batch["img"]), mean, std)
        gt = jnp.asarray(batch["gt"])
        if pad:
            # wrapped tail records: neutralize their labels
            gt = gt.at[batch_size - pad:].set(255)
        return img, gt, pad

    n = 0
    # uploads (6MB/img u8 at 1024x2048) overlap the eval dispatch
    pf = device_prefetch(iter(loader), prep)
    try:
        for img, gt, pad in pf:
            cm = cm + eval_step(variables, img, gt, arch, bounds=bounds)
            n += batch_size - pad
            if max_batches and n >= max_batches * batch_size:
                break
    finally:
        # the max_batches break leaves the producer mid-stream; close it
        # so the staged device batches release instead of pinning HBM
        pf.close()
    if jax.process_count() > 1:
        from ..parallel.mesh import all_gather_objects
        import numpy as _np
        cm = sum(_np.asarray(c) for c in all_gather_objects(_np.asarray(cm)))
        cm = jnp.asarray(cm)
    ev = SegEvaluator(num_classes, getattr(dataset, "CLASSES", None))
    ev._cm = cm
    return ev.evaluate()


def cross_arch_evaluate(model, variables, val_sampler, dataset, max_arch, *,
                        test_params: Optional[TestPipelineParams] = None,
                        batch_size: int = 1, flip: bool = False,
                        use_bounds: bool = False
                        ) -> Dict[str, Dict[str, float]]:
    """Evaluate every anchor of ``val_sampler`` (reference
    cross_arch_eval_hooks.py:50-92). One compiled eval graph serves all;
    ``use_bounds=True`` instead compiles one depth-proportional program per
    anchor (worth it on the chip when the val sweep dwarfs compile time)."""
    eval_step = make_eval_step(model, model.num_classes, flip,
                               ratios=getattr(test_params, "img_ratios",
                                              None))
    results: Dict[str, Dict[str, float]] = {}
    for i, meta in enumerate(val_sampler.traverse()):
        name = meta.get("name", val_sampler.anchor_name(i))
        arch = encode_arch(max_arch, meta)
        bounds = exact_bounds(max_arch, meta) if use_bounds else None
        t0 = time.time()
        metrics = evaluate(model, variables, dataset, arch,
                           test_params=test_params, batch_size=batch_size,
                           flip=flip, eval_step=eval_step, bounds=bounds)
        logger.info("cross-arch eval [%s]: mIoU=%.4f aAcc=%.4f (%.1fs)",
                    name, metrics["mIoU"], metrics["aAcc"],
                    time.time() - t0)
        results[name] = metrics
    return results


def group_population(metas, bucketer):
    """Bucket a population of sampler metas into depth groups:
    ``[(ArchBounds, [original indices])]``, cheapest bucket first.

    A masked population sweep at MAX bounds pays MAX-depth cost for every
    subnet (the sandwich mix averages ~0.6x MAX total depth); grouping by
    the train-side bucketer and sweeping each group under its own STATIC
    bounds restores depth-proportional eval cost at a bounded number of
    compiles — the eval-side analog of the bounded train step (reference
    depth semantics: dynamic_res_layer.py:166-172, blocks beyond
    depth_state never run).

    Width-aware refinement of the random groups was prototyped and
    rejected: on the flagship space the greedy population-specific bucket
    set cuts the executed-cost proxy only ~4-10% while adding 5+ compiled
    programs (3-5 min each on the relay) — the per-subnet cost floor
    dominates. Anchors already run at exact width via the bucketer."""
    groups: Dict = {}
    for i, m in enumerate(metas):
        groups.setdefault(bucketer(m), []).append(i)
    # a no-bound bucket (body_depth=None) runs at full MAX cost: sort it
    # LAST, not first (sum(()) would read as cheapest)
    return sorted(groups.items(),
                  key=lambda kv: (float("inf"), ())
                  if kv[0].body_depth is None
                  else (float(sum(kv[0].body_depth)), kv[0].body_depth))


def evaluate_population(model, variables, dataset, archs, *,
                        test_params: Optional[TestPipelineParams] = None,
                        batch_size: int = 1, bounds=None,
                        metas=None, bucketer=None, chunk: int = 8) -> list:
    """Score a whole population of subnets with a BOUNDED number of
    compiled graphs: per val batch, ``vmap`` over a stacked arch pytree
    accumulates a confusion matrix per subnet (BASELINE.json stretch
    config: vmapped 256-subnet population eval).

    With ``metas`` + ``bucketer`` the population is swept per depth bucket
    (see :func:`group_population`) so each subnet pays its bucket's
    depth-proportional cost instead of MAX; otherwise one program at
    ``bounds`` (which must COVER every arch — covering_bounds(...)) serves
    the whole stack. ``chunk`` caps the vmap width per dispatch.
    Returns a list of metric dicts, one per arch, in input order."""
    test_params = test_params or TestPipelineParams()
    num_classes = model.num_classes
    step = population_eval_steps(model, num_classes)
    mean = jnp.asarray(test_params.mean)
    std = jnp.asarray(test_params.std)

    if metas is not None and bucketer is not None:
        plan = group_population(metas, bucketer)
    else:
        plan = [(bounds, list(range(len(archs))))]

    cms = [None] * len(archs)
    for g_bounds, idxs in plan:
        # ONE dataset pass per bucket: every batch is loaded/normalized
        # once and fed to all of the bucket's arch chunks (same compiled
        # program throughout the bucket — no executable switching, no
        # len(archs)/chunk-fold host-IO multiplication)
        sels = [idxs[lo:lo + chunk] for lo in range(0, len(idxs), chunk)]
        stacks = [jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[archs[i] for i in sel])
            for sel in sels]
        accs = [jnp.zeros((len(sel), num_classes, num_classes), jnp.int32)
                for sel in sels]
        from ..data.device_cache import DeviceCachedDataset
        from ..data.transforms import gather_prepare_eval_batch
        _cache = dataset if isinstance(dataset, DeviceCachedDataset) \
            else None
        loader = BatchLoader(dataset, batch_size, shuffle=False,
                             drop_last=False,
                             index_only=_cache is not None)

        def prep(batch):
            pad = batch.get("pad_count", 0)
            if _cache is not None:
                return gather_prepare_eval_batch(
                    _cache._imgs, _cache._gts, jnp.asarray(batch["idx"]),
                    mean, std, jnp.asarray(pad, jnp.int32))
            img = prepare_eval_batch(jnp.asarray(batch["img"]), mean, std)
            gt = jnp.asarray(batch["gt"])
            if pad:
                gt = gt.at[batch_size - pad:].set(255)
            return img, gt

        for img, gt in device_prefetch(iter(loader), prep):
            for ci, stack in enumerate(stacks):
                accs[ci] = accs[ci] + step(variables, img, gt, stack,
                                           bounds=g_bounds)
        for sel, acc in zip(sels, accs):
            for k, i in enumerate(sel):
                cms[i] = acc[k]
    results = []
    for i in range(len(archs)):
        ev = SegEvaluator(num_classes, getattr(dataset, "CLASSES", None))
        ev._cm = cms[i]
        results.append(ev.evaluate())
    return results


def population_eval_steps(model, num_classes: int):
    """vmapped population evaluation: one compiled graph scores a stack of
    subnet archs per batch (BASELINE.json north star: vmap over subnet
    populations to amortize compilation)."""

    @functools.partial(jax.jit, static_argnames=("bounds",))
    def step(variables, img, gt, arch_stack, bounds=None):
        def one(arch):
            pred = model.apply(variables, img, arch, False, bounds,
                               method=model.simple_test)
            return confusion_matrix(pred, gt, num_classes)
        return jax.vmap(one)(arch_stack)

    return step
