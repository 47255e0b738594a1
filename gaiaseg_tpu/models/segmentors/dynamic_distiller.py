"""DynamicDistiller: supernet student distilled from a frozen teacher.

Capability parity with the reference ``DynamicDistiller``
(reference gaiaseg/models/segmentors/dynamic_distiller.py:151-540): a
dynamic student segmentor plus a frozen teacher whose logits/features feed
two distillation losses — the pixelwise softened CE
``-sum softmax(t/T) * log_softmax(s/T) / (B*H*W)`` (:341-356) and the
pairwise Gram-matrix similarity loss over a random 50% crop (:309-339,
implemented without the reference's row-crop bug). Whole/slide inference is
inherited from DynamicEncoderDecoder — the reference re-implements the
mmseg inference stack inside the distiller (:416-540); here it is shared.

TPU redesign: the teacher lives inside the same flax module so a single
jitted train step runs student + teacher; teacher activations are wrapped
in ``stop_gradient`` and teacher params are excluded from optimizer updates
via the ``frozen_param_labels`` mask (engine/optim), which replaces the
reference's ``.eval()`` + no_grad teacher (:195-200, :264-274).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from ...utils.registry import SEGMENTORS
from ..builder import build_backbone, build_head, build_neck
from ..losses.cross_entropy import distill_softened_ce, pairwise_gram_loss
from ..losses.dice_focal import pixel_accuracy
from .encoder_decoder import DynamicEncoderDecoder

Array = jnp.ndarray


@SEGMENTORS.register_module()
class DynamicDistiller(DynamicEncoderDecoder):
    teacher_backbone: Optional[Dict[str, Any]] = None
    teacher_decode_head: Optional[Dict[str, Any]] = None
    teacher_neck: Optional[Dict[str, Any]] = None
    distill_cfg: Optional[Dict[str, Any]] = None
    # reference: temperature T (:341-356), loss weights, pairwise switch

    def setup(self):
        super().setup()
        assert self.teacher_backbone is not None, \
            "DynamicDistiller needs a teacher_backbone config"
        self.t_backbone = build_backbone(self.teacher_backbone)
        self.t_neck = build_neck(self.teacher_neck) if self.teacher_neck \
            else None
        self.t_decode_head = build_head(self.teacher_decode_head) \
            if self.teacher_decode_head else None

    def _distill_params(self):
        cfg = dict(self.distill_cfg or {})
        return (float(cfg.get("temperature", 1.0)),
                float(cfg.get("distill_weight", 1.0)),
                float(cfg.get("pairwise_weight", 0.0)))

    def teacher_forward(self, img: Array) -> Tuple[Any, Optional[Array]]:
        """Frozen teacher features + logits (reference :264-274).

        The reference teacher is a static BEiT; here the teacher may also
        be an elastic backbone (e.g. a trained supernet distilling into a
        fresh one — self-distillation), in which case it runs at its MAX
        arch: static python ints, so the teacher stays one fixed graph.
        """
        t_arch = self.t_backbone.max_arch() \
            if hasattr(self.t_backbone, "max_arch") else None
        feats = self.t_backbone(img, t_arch, train=False)
        if self.t_neck is not None:
            feats = self.t_neck(feats, train=False)
        feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        logits = None
        if self.t_decode_head is not None:
            logits = jax.lax.stop_gradient(
                self.t_decode_head(feats, train=False))
        return feats, logits

    def forward_train(self, img: Array, gt: Array, arch: Dict[str, Any],
                      compute_acc: bool = True, bounds=None
                      ) -> Tuple[Array, Dict[str, Array]]:
        # ``bounds`` applies to the elastic STUDENT backbone only (the
        # frozen teacher is static) — the train loop's bounded-cycle
        # dispatch passes it positionally (engine/train.py make_train_step)
        temperature, w_distill, w_pair = self._distill_params()
        feats = self.extract_feat(img, arch, train=True, bounds=bounds)
        label_hw = gt.shape[1:3]
        losses: Dict[str, Array] = {}

        dec = self.decode_head_m(feats, train=True)
        if compute_acc:
            # accuracy needs the full-res prediction anyway — shared path
            dec_r = resize_bilinear(dec, label_hw, self.align_corners)
            losses["decode.loss_seg"] = self.loss_decode(dec_r, gt)
            losses["decode.acc_seg"] = pixel_accuracy(dec_r, gt)
        else:
            # fused upsample+CE Pallas path when eligible (_seg_loss,
            # encoder_decoder.py) — the hot distill step avoids the
            # full-res logit HBM round-trip exactly like the plain trainer
            losses["decode.loss_seg"] = self._seg_loss(
                dec, gt, label_hw, self.loss_decode)
        for i, (head, loss_fn) in enumerate(zip(self.aux_heads,
                                                self.aux_losses)):
            a = head(feats, train=True)
            losses[f"aux_{i}.loss_seg"] = self._seg_loss(
                a, gt, label_hw, loss_fn)

        t_feats, t_logits = self.teacher_forward(img)
        if t_logits is not None and w_distill > 0:
            tl = resize_bilinear(t_logits, dec.shape[1:3],
                                 self.align_corners)
            losses["distill_loss_seg"] = w_distill * distill_softened_ce(
                dec, tl, temperature)
        if w_pair > 0:
            s_top = feats[-1]
            t_top = t_feats[-1]
            if t_top.shape[1:3] != s_top.shape[1:3]:
                t_top = resize_bilinear(t_top, s_top.shape[1:3])
            rng = self.make_rng("dropout") if self.has_rng("dropout") else None
            losses["pairwise_loss_seg"] = w_pair * pairwise_gram_loss(
                s_top, t_top, rng)

        total = sum(v for k, v in losses.items() if "loss" in k)
        return total, losses


def frozen_param_labels(params: Dict[str, Any],
                        frozen_prefixes=("t_backbone", "t_neck",
                                         "t_decode_head")) -> Dict[str, Any]:
    """optax.masked labels: True = frozen (teacher) subtree."""
    def walk(tree, frozen):
        if not isinstance(tree, dict):
            return frozen
        return {k: walk(v, frozen or k in frozen_prefixes)
                for k, v in tree.items()}
    return walk(params, False)
