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

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..data.loader import BatchLoader
from ..data.pipeline_cfg import TestPipelineParams
from ..data.transforms import prepare_eval_batch


def reset_bn_stats(batch_stats: Dict[str, Any]) -> Dict[str, Any]:
    """Zero means / unit vars across the whole stats tree."""
    def reset(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.zeros_like(leaf)
        if name == "var":
            return jnp.ones_like(leaf)
        return leaf
    return jax.tree_util.tree_map_with_path(reset, batch_stats)


def calibrate_bn(model, variables: Dict[str, Any], dataset, arch, *,
                 num_batches: int = 16, batch_size: int = 2,
                 test_params: Optional[TestPipelineParams] = None,
                 momentum_override: Optional[float] = None,
                 rng=None) -> Dict[str, Any]:
    """Returns ``variables`` with batch_stats re-estimated for ``arch`` by
    running forward passes in training-BN mode (no parameter updates)."""
    test_params = test_params or TestPipelineParams()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = dict(variables)
    variables["batch_stats"] = reset_bn_stats(variables["batch_stats"])
    mean = jnp.asarray(test_params.mean)
    std = jnp.asarray(test_params.std)

    @jax.jit
    def step(vs, img, key):
        _, mut = model.apply(vs, img, arch, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key})
        return mut["batch_stats"]

    loader = BatchLoader(dataset, batch_size, shuffle=True, drop_last=True,
                         infinite=True)
    it = iter(loader)
    for i in range(num_batches):
        batch = next(it)
        img = prepare_eval_batch(jnp.asarray(batch["img"]), mean, std)
        rng, k = jax.random.split(rng)
        variables["batch_stats"] = step(variables, img, k)
    return variables
