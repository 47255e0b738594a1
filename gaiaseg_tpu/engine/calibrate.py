"""BN calibration: reset + re-estimate running statistics for a subnet.

Capability parity with the reference's two calibration knobs:
``caliberate_bn.reset_stats`` before training-time calibration (reference
apis/train.py:177-184) and the minibatch-statistics eval mode of
test_supernet (``running_mean=None; track_running_stats=False``, reference
tools/test_supernet.py:190-198). Under weight-sharing NAS, each subnet's BN
statistics differ from the supernet's mixture stats; re-estimating them for
the chosen arch before eval recovers mIoU.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.loader import BatchLoader
from ..data.pipeline_cfg import TestPipelineParams
from ..data.transforms import prepare_eval_batch

# Frozen-teacher subtrees (DynamicDistiller): their BN stats are TRAINED
# values consumed with use_running_average=True — resetting them would
# permanently lobotomize the teacher, because teacher_forward(train=False)
# never re-estimates.
FROZEN_STAT_PREFIXES: Tuple[str, ...] = ("t_backbone", "t_neck",
                                         "t_decode_head")


def _top_key(path) -> str:
    if not path:
        return ""
    p = path[0]
    return p.key if hasattr(p, "key") else str(p)


def reset_bn_stats(batch_stats: Dict[str, Any],
                   skip_prefixes: Tuple[str, ...] = FROZEN_STAT_PREFIXES
                   ) -> Dict[str, Any]:
    """Zero means / unit vars across the stats tree, except frozen-teacher
    subtrees (their trained stats must survive calibration)."""
    def reset(path, leaf):
        if _top_key(path) in skip_prefixes:
            return leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.zeros_like(leaf)
        if name == "var":
            return jnp.ones_like(leaf)
        return leaf
    return jax.tree_util.tree_map_with_path(reset, batch_stats)


# one jitted step per model object: repeated calibrate_bn calls (every
# ckpt/eval boundary of a soak) must not rebuild the traced program —
# each fresh @jax.jit closure is a separate executable upload on the
# relay. ``arch`` is a traced argument, so one program also serves every
# calibration arch.
_STEP_CACHE: Dict[int, Tuple[Any, Any]] = {}


def _calib_step(model):
    hit = _STEP_CACHE.get(id(model))
    if hit is not None and hit[0] is model:
        return hit[1]

    @jax.jit
    def step(vs, img, arch, key):
        _, mut = model.apply(vs, img, arch, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key})
        return mut["batch_stats"]

    if len(_STEP_CACHE) > 16:
        _STEP_CACHE.clear()
    _STEP_CACHE[id(model)] = (model, step)
    return step


def _debias_stats(batch_stats: Dict[str, Any], momentum: float,
                  num_batches: int,
                  skip_prefixes: Tuple[str, ...] = FROZEN_STAT_PREFIXES
                  ) -> Dict[str, Any]:
    """Remove the reset-init contribution from the post-calibration EMA.

    After reset (mean=0, var=1) and k EMA updates at decay m, the running
    stat is ``m^k * init + (1 - m^k) * EW(batch stats)`` — at the default
    m=0.9, k=8 that leaves 43% of the fresh-init values in the result,
    biasing eval normalization toward (0, 1). Dividing out ``1 - m^k``
    (and subtracting the init-var term) yields an unbiased exponentially
    weighted average of the observed batch statistics. Leaves that were
    never updated (inactive channels / depth-gated blocks, still exactly
    (0, 1)) map to (0, 1) unchanged, so the correction is safe to apply
    to the whole tree; frozen-teacher subtrees are skipped because they
    were never reset.
    """
    q = float(momentum) ** int(num_batches)
    if q <= 0.0 or q >= 1.0:
        return batch_stats
    scale = 1.0 - q

    def debias(path, leaf):
        if _top_key(path) in skip_prefixes:
            return leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return leaf / scale
        if name == "var":
            return jnp.maximum((leaf - q) / scale, 1e-12)
        return leaf
    return jax.tree_util.tree_map_with_path(debias, batch_stats)


def calibrate_bn(model, variables: Dict[str, Any], dataset, arch, *,
                 num_batches: int = 16, batch_size: int = 2,
                 test_params: Optional[TestPipelineParams] = None,
                 momentum_override: Optional[float] = None,
                 rng=None) -> Dict[str, Any]:
    """Returns ``variables`` with batch_stats re-estimated for ``arch`` by
    running forward passes in training-BN mode (no parameter updates).

    ``momentum_override``: the BN layers' EMA decay assumed by the debias
    correction (default 0.9, `ops/dynamic_layers.py` DynBatchNorm).
    """
    test_params = test_params or TestPipelineParams()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = dict(variables)
    variables["batch_stats"] = reset_bn_stats(variables["batch_stats"])
    mean = jnp.asarray(test_params.mean)
    std = jnp.asarray(test_params.std)

    step = _calib_step(model)
    loader = BatchLoader(dataset, batch_size, shuffle=True, drop_last=True,
                         infinite=True)
    it = iter(loader)
    for i in range(num_batches):
        batch = next(it)
        img = prepare_eval_batch(jnp.asarray(batch["img"]), mean, std)
        rng, k = jax.random.split(rng)
        variables["batch_stats"] = step(variables, img, arch, k)
    momentum = 0.9 if momentum_override is None else float(momentum_override)
    variables["batch_stats"] = _debias_stats(
        variables["batch_stats"], momentum, num_batches)
    return variables
