"""Segmentation losses: cross-entropy family.

Capability parity with the reference losses package (SURVEY.md §2.7 —
orphaned in the reference but documenting intended capability; configs
resolve ``type='CrossEntropyLoss'`` against mmseg's implementation, which is
the behavior reproduced here): softmax CE with ``class_weight``,
``ignore_index``, ``avg_factor`` semantics; sigmoid BCE; mask CE.

Logits are NHWC ``[N,H,W,C]`` float; labels ``[N,H,W]`` int32 with
``ignore_index`` (default 255, the seg pad value).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES

Array = jnp.ndarray


def weight_reduce_loss(loss: Array, weight: Optional[Array] = None,
                       reduction: str = "mean",
                       avg_factor: Optional[Array] = None) -> Array:
    """mmseg-style reduction (reference gaiaseg/models/losses/utils.py:26-56)."""
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)


def softmax_cross_entropy(logits: Array, label: Array,
                          class_weight: Optional[Array] = None,
                          ignore_index: int = 255,
                          reduction: str = "mean",
                          avg_non_ignore: bool = True,
                          pixel_weight: Optional[Array] = None) -> Array:
    num_classes = logits.shape[-1]
    valid = (label != ignore_index)
    safe_label = jnp.where(valid, label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_label[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)[safe_label]
        w = w * cw
    if pixel_weight is not None:
        w = w * pixel_weight.astype(jnp.float32)
    if reduction == "none":
        return nll * w
    if avg_non_ignore and reduction == "mean":
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return weight_reduce_loss(nll, w, reduction)


def binary_cross_entropy(logits: Array, label: Array,
                         ignore_index: int = 255,
                         class_weight: Optional[Array] = None) -> Array:
    """Sigmoid BCE over one-hot targets (multi-label capable)."""
    num_classes = logits.shape[-1]
    valid = (label != ignore_index)
    safe_label = jnp.where(valid, label, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe_label, num_classes, dtype=jnp.float32)
    x = logits.astype(jnp.float32)
    per = jnp.maximum(x, 0) - x * onehot + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if class_weight is not None:
        per = per * jnp.asarray(class_weight, jnp.float32)
    per = jnp.sum(per, axis=-1)
    w = valid.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


@LOSSES.register_module()
class CrossEntropyLoss:
    """Config-buildable CE wrapper (``type='CrossEntropyLoss'`` in every
    reference model config, e.g. pspnet_ar50to101v2_gsync.py:33-36,48-51)."""

    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = "mean", class_weight: Any = None,
                 loss_weight: float = 1.0, avg_non_ignore: bool = True,
                 loss_name: str = "loss_ce"):
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight
        self.avg_non_ignore = avg_non_ignore
        self.loss_name = loss_name

    def __call__(self, logits: Array, label: Array, weight=None,
                 ignore_index: int = 255, **kwargs) -> Array:
        if self.use_sigmoid:
            loss = binary_cross_entropy(logits, label, ignore_index,
                                        self.class_weight)
        else:
            loss = softmax_cross_entropy(
                logits, label, self.class_weight, ignore_index,
                self.reduction, self.avg_non_ignore, pixel_weight=weight)
        return self.loss_weight * loss


def distill_softened_ce(student_logits: Array, teacher_logits: Array,
                        temperature: float = 1.0) -> Array:
    """Pixelwise softened CE ``-sum softmax(t/T) * log_softmax(s/T) / (B*H*W)``
    (reference gaiaseg/models/segmentors/dynamic_distiller.py:341-356)."""
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / temperature, -1)
    logs = jax.nn.log_softmax(student_logits.astype(jnp.float32) / temperature, -1)
    n = student_logits.shape[0] * student_logits.shape[1] * student_logits.shape[2]
    return -jnp.sum(t * logs) / n


def pairwise_gram_loss(student_feat: Array, teacher_feat: Array,
                       rng: Optional[Array] = None) -> Array:
    """Pairwise similarity distillation: channel-normalize, Gram matrices
    ``[N, HW, HW]``, CE between teacher/student similarity distributions
    (reference dynamic_distiller.py:309-339 — minus its row-crop bug at
    :329-330, which dropped a slice and is deliberately not reproduced,
    SURVEY.md §2.10). A random 50% spatial crop is applied when ``rng``
    is given, matching the reference's random crop."""
    def gram(f):
        f = f.astype(jnp.float32)
        n, h, w, c = f.shape
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        f = f.reshape(n, h * w, c)
        return jnp.einsum("npc,nqc->npq", f, f)

    n, h, w, c = student_feat.shape
    if rng is not None and h // 2 >= 2 and w // 2 >= 2:
        # skip the crop for tiny feature maps: a 1-position Gram row is a
        # one-hot softmax and the CE collapses to exactly 0, silently
        # killing the loss (production 512-crop features are 16x16+, where
        # the reference's 50% crop semantics apply unchanged)
        sh, sw = max(h // 2, 1), max(w // 2, 1)
        ky, kx = jax.random.split(rng)
        y0 = jax.random.randint(ky, (), 0, h - sh + 1)
        x0 = jax.random.randint(kx, (), 0, w - sw + 1)
        student_feat = jax.lax.dynamic_slice(
            student_feat, (0, y0, x0, 0), (n, sh, sw, c))
        teacher_feat = jax.lax.dynamic_slice(
            teacher_feat, (0, y0, x0, teacher_feat.shape[-1] * 0),
            (n, sh, sw, teacher_feat.shape[-1]))
    gs, gt = gram(student_feat), gram(teacher_feat)
    pt = jax.nn.softmax(gt, -1)
    logps = jax.nn.log_softmax(gs, -1)
    return -jnp.mean(jnp.sum(pt * logps, axis=-1))
