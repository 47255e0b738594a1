"""Equalization loss (EQL) + packed-multi-label BCE + mask CE.

Capability parity with the reference's loss variants
(reference gaiaseg/models/losses/cross_entropy_loss.py:118-295 and
cross_entropy_loss_EQL.py:100-206): EQL-style random suppression of
negative gradients for rare classes (0.618 sample ratio), the 3-bit-packed
multi-label decode (``label & 7`` then ``>> 3`` per category), and mask CE.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES

Array = jnp.ndarray


def decode_packed_labels(label: Array, num_classes: int) -> Array:
    """Decode the reference's 3-bit-packed multi-label encoding: each pixel
    int packs per-category votes; category k's code is
    ``(label >> (3*k)) & 7`` with 1 = positive (reference
    cross_entropy_loss.py:118-186). Returns one-hot-ish float [.., C]."""
    label = label.astype(jnp.int32)
    codes = [(label >> (3 * k)) & 7 for k in range(num_classes)]
    onehot = jnp.stack([(c == 1).astype(jnp.float32) for c in codes], -1)
    return onehot


def equalize_loss(logits: Array, label: Array, rng: Array,
                  tail_classes: Optional[Sequence[int]] = None,
                  sample_ratio: float = 0.618,
                  ignore_index: int = 255) -> Array:
    """EQL: sigmoid BCE where the negative-gradient term for tail classes is
    randomly suppressed with prob ``sample_ratio`` (reference
    cross_entropy_loss.py:188-258, golden ratio 0.618)."""
    num_classes = logits.shape[-1]
    valid = (label != ignore_index)
    safe = jnp.where(valid, label, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    x = logits.astype(jnp.float32)
    bce = jnp.maximum(x, 0) - x * onehot + jnp.log1p(jnp.exp(-jnp.abs(x)))

    tail = jnp.zeros((num_classes,), jnp.float32)
    if tail_classes is not None:
        tail = tail.at[jnp.asarray(tail_classes, jnp.int32)].set(1.0)
    # E(r): per-pixel bernoulli keeping negatives with prob (1-sample_ratio)
    keep_neg = jax.random.bernoulli(
        rng, 1.0 - sample_ratio, bce.shape).astype(jnp.float32)
    # weight w = 1 - tail * (1 - E) * (1 - onehot): positives always count;
    # negatives of tail classes are randomly dropped
    w = 1.0 - tail * (1.0 - keep_neg) * (1.0 - onehot)
    loss = jnp.sum(bce * w, axis=-1)
    v = valid.astype(jnp.float32)
    return jnp.sum(loss * v) / jnp.maximum(jnp.sum(v), 1.0)


def mask_cross_entropy(logits: Array, label: Array, mask: Array,
                       ignore_index: int = 255) -> Array:
    """CE restricted to a boolean pixel mask (reference
    cross_entropy_loss.py:261-295)."""
    from .cross_entropy import softmax_cross_entropy
    return softmax_cross_entropy(logits, label, ignore_index=ignore_index,
                                 pixel_weight=mask.astype(jnp.float32))


@LOSSES.register_module()
class EQLCrossEntropyLoss:
    """Config-buildable EQL wrapper (``type='EQLCrossEntropyLoss'``;
    the reference duplicate-registers it as CrossEntropyLoss in
    cross_entropy_loss_EQL.py:205-206 — here it keeps its own name)."""

    def __init__(self, tail_classes: Sequence[int] = (),
                 sample_ratio: float = 0.618, loss_weight: float = 1.0,
                 loss_name: str = "loss_eql", **kw):
        self.tail_classes = tuple(tail_classes)
        self.sample_ratio = sample_ratio
        self.loss_weight = loss_weight
        self.loss_name = loss_name
        self._fallback_key = jax.random.PRNGKey(0)

    def __call__(self, logits, label, ignore_index: int = 255,
                 rng: Optional[Array] = None, **kw):
        rng = rng if rng is not None else self._fallback_key
        return self.loss_weight * equalize_loss(
            logits, label, rng, self.tail_classes, self.sample_ratio,
            ignore_index)


def self_cross_entropy(logits: Array, label: Array,
                       num_classes: Optional[int] = None,
                       ignore_index: int = 255) -> Array:
    """Self-supervised-style BCE with partially detached targets over the
    3-bit packed multi-label encoding (reference
    cross_entropy_loss.py:11-65): positives (code 1) train against 1,
    "self" pixels (code 2) train against the detached sigmoid of the
    model's own logit."""
    num_classes = num_classes or logits.shape[-1]
    label = label.astype(jnp.int32)
    codes = jnp.stack([(label >> (3 * k)) & 7 for k in range(num_classes)],
                      -1)
    x = logits.astype(jnp.float32)
    p_detached = jax.lax.stop_gradient(jax.nn.sigmoid(x))
    target = jnp.where(codes == 1, 1.0,
                       jnp.where(codes == 2, p_detached, 0.0))
    bce = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    valid = jnp.any(codes > 0, axis=-1) & (label != ignore_index)
    w = valid.astype(jnp.float32)
    return jnp.sum(jnp.sum(bce, -1) * w) / jnp.maximum(jnp.sum(w), 1.0)
