"""API-surface shim matching the reference's ``gaiaseg.apis`` module
(reference gaiaseg/apis/__init__.py: train_segmentor, set_random_seed,
single_gpu_test/multi_gpu_test, init_segmentor/inference_segmentor,
show_result_pyplot). GAIA-seg users keep their import sites; TPU semantics
behind them.
"""
from __future__ import annotations

import random
from typing import Optional

import numpy as np

from .engine import (evaluate, inference_segmentor, init_segmentor,
                     show_result, train_segmentor)
from .engine.evaluate import cross_arch_evaluate, evaluate_population

__all__ = [
    "train_segmentor", "set_random_seed", "init_segmentor",
    "inference_segmentor", "show_result", "show_result_pyplot",
    "single_gpu_test", "multi_gpu_test", "evaluate", "cross_arch_evaluate",
    "evaluate_population",
]


def set_random_seed(seed: int, deterministic: bool = True) -> None:
    """reference apis/train.py:30-45; JAX is deterministic given PRNG keys,
    so only host-side RNGs need seeding."""
    random.seed(seed)
    np.random.seed(seed)


def single_gpu_test(model, variables, dataset, arch, **kw):
    """Single-process eval loop (reference apis/test.py:13-65). Returns the
    metric dict rather than raw per-image results: predictions stay on
    device (confusion-matrix accumulation)."""
    return evaluate(model, variables, dataset, arch, **kw)


def multi_gpu_test(model, variables, dataset, arch, **kw):
    """Sharded eval (reference apis/test.py:68-186): under a jit'd mesh the
    batch shards over devices and the confusion matrix all-reduces — the
    pickle-tensor collect_results machinery has no TPU equivalent to need."""
    return evaluate(model, variables, dataset, arch, **kw)


def show_result_pyplot(img, seg_map, palette=None, opacity=0.5,
                       out_file: Optional[str] = None):
    return show_result(img, seg_map, palette, opacity, out_file)
