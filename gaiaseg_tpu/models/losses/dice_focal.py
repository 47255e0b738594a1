"""Dice / focal / mixed losses + pixel accuracy.

Capability parity with the reference losses package
(reference gaiaseg/models/losses/dice_loss.py, focal_loss.py, mixed_loss.py,
accuracy.py — SURVEY.md §2.7).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES

Array = jnp.ndarray


def multiclass_dice(logits: Array, label: Array, ignore_index: int = 255,
                    smooth: float = 1.0) -> Array:
    """Softmax + one-hot per-class dice averaged over classes
    (reference dice_loss.py:93-109)."""
    num_classes = logits.shape[-1]
    valid = (label != ignore_index)
    safe = jnp.where(valid, label, 0).astype(jnp.int32)
    prob = jax.nn.softmax(logits.astype(jnp.float32), -1)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    v = valid.astype(jnp.float32)[..., None]
    prob = prob * v
    onehot = onehot * v
    inter = jnp.sum(prob * onehot, axis=(0, 1, 2))
    denom = jnp.sum(prob, axis=(0, 1, 2)) + jnp.sum(onehot, axis=(0, 1, 2))
    dice = (2 * inter + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def binary_dice(prob: Array, target: Array, smooth: float = 1.0) -> Array:
    inter = jnp.sum(prob * target)
    return 1.0 - (2 * inter + smooth) / (jnp.sum(prob) + jnp.sum(target) + smooth)


@LOSSES.register_module()
class DiceLoss:
    def __init__(self, loss_weight: float = 1.0, binary_class: bool = False,
                 smooth: float = 1.0, loss_name: str = "loss_dice", **kw):
        self.loss_weight = loss_weight
        self.binary_class = binary_class
        self.smooth = smooth
        self.loss_name = loss_name

    def __call__(self, logits, label, ignore_index: int = 255, **kw):
        if self.binary_class:
            prob = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
            target = (label == 1).astype(jnp.float32)
            return self.loss_weight * binary_dice(prob, target, self.smooth)
        return self.loss_weight * multiclass_dice(logits, label, ignore_index,
                                                  self.smooth)


def sigmoid_focal(logits: Array, label: Array, alpha: float = 0.25,
                  gamma: float = 2.0, ignore_index: int = 255) -> Array:
    """Sigmoid focal loss (reference focal_loss.py:31-82)."""
    num_classes = logits.shape[-1]
    valid = (label != ignore_index)
    safe = jnp.where(valid, label, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    bce = jnp.maximum(x, 0) - x * onehot + jnp.log1p(jnp.exp(-jnp.abs(x)))
    pt = p * onehot + (1 - p) * (1 - onehot)
    at = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = jnp.sum(at * ((1 - pt) ** gamma) * bce, axis=-1)
    w = valid.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def softmax_focal(logits: Array, label: Array, gamma: float = 2.0,
                  ignore_index: int = 255) -> Array:
    """Softmax-CE focal re-weighting (reference focal_loss.py:85-111)."""
    valid = (label != ignore_index)
    safe = jnp.where(valid, label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
    pt = jnp.exp(-nll)
    loss = ((1 - pt) ** gamma) * nll
    w = valid.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid: bool = True, alpha: float = 0.25,
                 gamma: float = 2.0, loss_weight: float = 1.0,
                 loss_name: str = "loss_focal", **kw):
        self.use_sigmoid = use_sigmoid
        self.alpha = alpha
        self.gamma = gamma
        self.loss_weight = loss_weight
        self.loss_name = loss_name

    def __call__(self, logits, label, ignore_index: int = 255, **kw):
        if self.use_sigmoid:
            return self.loss_weight * sigmoid_focal(
                logits, label, self.alpha, self.gamma, ignore_index)
        return self.loss_weight * softmax_focal(logits, label, self.gamma,
                                                ignore_index)


@LOSSES.register_module()
class MixedLoss:
    """Weighted sum of sub-losses built from configs
    (reference mixed_loss.py:37-93)."""

    def __init__(self, losses: Sequence[dict], weights: Sequence[float] = None,
                 loss_weight: float = 1.0, loss_name: str = "loss_mixed", **kw):
        self.losses = [LOSSES.build(dict(c)) for c in losses]
        self.weights = list(weights) if weights else [1.0] * len(self.losses)
        self.loss_weight = loss_weight
        self.loss_name = loss_name

    def __call__(self, logits, label, ignore_index: int = 255, **kw):
        total = 0.0
        for w, fn in zip(self.weights, self.losses):
            total = total + w * fn(logits, label, ignore_index=ignore_index)
        return self.loss_weight * total


def pixel_accuracy(logits: Array, label: Array, ignore_index: int = 255,
                   topk: int = 1, thresh: Optional[float] = None) -> Array:
    """Top-k pixel accuracy with optional score threshold
    (reference accuracy.py:4-50)."""
    valid = (label != ignore_index)
    safe = jnp.where(valid, label, 0).astype(jnp.int32)
    if topk == 1 and thresh is None:
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == safe) & valid
        return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)
    scores = jax.nn.softmax(logits.astype(jnp.float32), -1)
    _, idx = jax.lax.top_k(scores, topk)
    hit = jnp.any(idx == safe[..., None], axis=-1)
    if thresh is not None:
        top_score = jnp.max(scores, axis=-1)
        hit = hit & (top_score > thresh)
    return jnp.sum(hit & valid) / jnp.maximum(jnp.sum(valid), 1)
