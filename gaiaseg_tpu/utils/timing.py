"""Relay-safe on-chip timing helpers shared by bench.py and tools/probe_*.

On the axon TPU relay ``jax.block_until_ready`` is a NO-OP; the only
reliable sync is a device->host copy of one scalar. Dispatch is async, so
the pattern is: enqueue N calls, fetch once, divide (see CLAUDE.md
"TPU/relay perf rules").
"""
from __future__ import annotations

import time

import jax
import numpy as np


def fetch_scalar(out):
    """Force execution of everything enqueued by pulling one scalar."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def time_fn(fn, n: int = 6, warmup: int = 1) -> float:
    """Average seconds per call of a nullary fn (same compiled program
    throughout — do NOT alternate programs inside fn; see CLAUDE.md)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn()
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch_scalar(out)
    return (time.perf_counter() - t0) / n
