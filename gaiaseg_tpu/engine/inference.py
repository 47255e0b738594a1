"""Single-image inference API.

Capability parity with reference gaiaseg/apis/inference.py:23-128:
``init_segmentor`` (build from config + load checkpoint, attach
CLASSES/PALETTE), ``inference_segmentor`` (pipeline from cfg.data.test,
forward, per-image seg map), ``show_result`` (palette overlay; replaces
show_result_pyplot without requiring a display).
"""
from __future__ import annotations

import logging
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import CITYSCAPES_PALETTE
from ..data.pipeline_cfg import parse_test_pipeline
from ..data.transforms import prepare_eval_batch
from ..models.arch_util import encode_arch, jit_init, model_max_arch
from ..models.builder import build_segmentor
from ..utils.config import Config
from .checkpoint import load_checkpoint

logger = logging.getLogger("gaiaseg_tpu")


class Segmentor:
    """Bundle of (model, variables, max_arch, cfg) with CLASSES/PALETTE."""

    def __init__(self, model, variables, max_arch, cfg,
                 classes=None, palette=None):
        self.model = model
        self.variables = variables
        self.max_arch = max_arch
        self.cfg = cfg
        self.CLASSES = classes
        self.PALETTE = palette
        self._jit_test = jax.jit(
            lambda v, img, arch: model.apply(v, img, arch,
                                             method=model.simple_test))

    def arch(self, meta: Optional[Dict] = None):
        return encode_arch(self.max_arch, meta)


def init_segmentor(config: Union[str, Config],
                   checkpoint: Optional[str] = None,
                   seed: int = 0) -> Segmentor:
    cfg = Config.fromfile(config) if isinstance(config, str) else config
    model = build_segmentor(cfg["model"], test_cfg=cfg["model"].get("test_cfg"))
    max_arch = model_max_arch(cfg["model"])
    init_img = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    init_gt = jnp.zeros((1, 64, 64), jnp.int32)
    k = jax.random.PRNGKey(seed)
    # init through forward_train so auxiliary-head params exist in the
    # template (checkpoints from training carry them)
    variables = jit_init(model, {"params": k, "dropout": k}, init_img,
                         init_gt, encode_arch(max_arch),
                         method="forward_train")
    classes = palette = None
    if checkpoint:
        tmpl = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
        loaded, meta = load_checkpoint(checkpoint, tmpl)
        variables = dict(variables)
        variables.update(loaded)
        classes = meta.get("CLASSES")
        palette = meta.get("PALETTE")
    return Segmentor(model, dict(variables), max_arch, cfg, classes, palette)


def inference_segmentor(seg: Segmentor, img: Union[str, np.ndarray],
                        arch_meta: Optional[Dict] = None) -> np.ndarray:
    """Returns the per-pixel class map [H,W] int32."""
    if isinstance(img, str):
        from PIL import Image
        with Image.open(img) as im:
            img = np.asarray(im.convert("RGB"), np.uint8)
    pipe = parse_test_pipeline(
        ((seg.cfg.get("data") or {}).get("test") or {}).get("pipeline"))
    x = prepare_eval_batch(jnp.asarray(img[None]), jnp.asarray(pipe.mean),
                           jnp.asarray(pipe.std))
    pred = seg._jit_test(seg.variables, x, seg.arch(arch_meta))
    return np.asarray(pred[0], np.int32)


def show_result(img: np.ndarray, seg_map: np.ndarray, palette=None,
                opacity: float = 0.5,
                out_file: Optional[str] = None) -> np.ndarray:
    palette = np.asarray(palette if palette is not None
                         else CITYSCAPES_PALETTE, np.uint8)
    color = palette[np.clip(seg_map, 0, len(palette) - 1)]
    blend = (img.astype(np.float32) * (1 - opacity)
             + color.astype(np.float32) * opacity).astype(np.uint8)
    if out_file:
        from PIL import Image
        Image.fromarray(blend).save(out_file)
    return blend
