"""Channel/depth mask helpers — the shape-stable core of the TPU rebuild.

The reference's elasticity is Python control flow: attribute writes change
which blocks run and which channel slices exist (reference
gaiaseg/models/utils/dynamic_res_layer.py:149-172, gaiavision DynamicConv2d).
Under XLA that recompiles per subnet. Here a subnet is a pytree of traced
int32 scalars/vectors; widths become channel masks and depths become
per-block active flags, so ONE compiled graph serves every subnet and
``vmap`` over the arch pytree evaluates populations (SURVEY.md §7).
"""
from __future__ import annotations

from typing import Any, Dict, Union

import jax.numpy as jnp

IntLike = Union[int, jnp.ndarray]


def channel_mask(width: IntLike, max_width: int, dtype=jnp.float32) -> jnp.ndarray:
    """``[1]*width + [0]*(max_width - width)`` as a traced array.

    Multiplying activations by this mask is numerically identical to slicing
    weights to ``width`` channels (gaiavision DynamicConv2d semantics) for
    every op whose inactive input channels are zero.
    """
    return (jnp.arange(max_width) < width).astype(dtype)


def depth_mask(depth: IntLike, max_depth: int, dtype=jnp.float32) -> jnp.ndarray:
    """Active flag per block index: block ``i`` runs iff ``i < depth``
    (reference dynamic_res_layer.py:170-172 loops ``self[0:depth_state]``)."""
    return (jnp.arange(max_depth) < depth).astype(dtype)


def apply_channel_mask(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Zero inactive channels along ``axis`` (default NHWC channel axis)."""
    if axis in (-1, x.ndim - 1):
        return x * mask.astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = mask.shape[0]
    return x * mask.astype(x.dtype).reshape(shape)


def active_count(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Number of active channels (for mean/var normalization in masked norms)."""
    return jnp.maximum(jnp.sum(mask.astype(dtype)), 1.0)


def tree_to_ints(arch: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a nested arch dict of Python ints/lists to traced int32 arrays."""
    def _conv(v):
        if isinstance(v, dict):
            return {k: _conv(x) for k, x in v.items()}
        return jnp.asarray(v, dtype=jnp.int32)
    return {k: _conv(v) for k, v in arch.items()}
