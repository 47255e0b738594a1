"""Subnet extraction: physically slice the supernet pytree into a standalone
deployable subnet.

Capability parity with reference tools/extract_subnet.py + gaiavision
``model.deploy()`` (SURVEY.md §3.4): per traversed meta, materialize a
subnet whose parameter shapes ARE the active widths/depths, save as an
md5(meta)-named standalone checkpoint.

TPU redesign: deploy-time pruning is a pure pytree transformation — no
deepcopy of a mutated module, no dummy forward needed. The subnet config is
the supernet config with the backbone's MAX widths/depths replaced by the
meta's; parameters are sliced leaf-by-leaf to the freshly-initialized subnet
shapes. Because masks are prefix masks, every slice is a leading slice except
kernels consuming a concat whose first segment is elastic (PSP bottleneck /
FCN conv_cat — the reference's ``channel_record`` machinery,
psp_head.py:235-239), which get segment-aware row gathers.

The extracted subnet runs through the SAME model classes at its own MAX
(=active) shapes: masked-supernet forward at meta == extracted forward at
max, property-tested in tests/test_extract.py.
"""
from __future__ import annotations

import copy
import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..archspace.meta import meta_hash
from ..models.arch_util import canonical_arch, encode_arch, model_max_arch
from ..models.builder import build_segmentor

logger = logging.getLogger("gaiaseg_tpu")


def subnet_model_cfg(model_cfg: Dict[str, Any],
                     arch: Dict[str, Any]) -> Dict[str, Any]:
    """Supernet cfg -> static subnet cfg (active widths become MAX)."""
    cfg = copy.deepcopy(dict(model_cfg))
    bb = dict(cfg["backbone"])
    bb_arch = arch["backbone"]
    if "stem" in bb_arch:
        bb["stem_width"] = bb_arch["stem"]["width"]
    if "body" in bb_arch:
        bb["body_width"] = list(bb_arch["body"]["width"])
        bb["body_depth"] = list(bb_arch["body"]["depth"])
    cfg["backbone"] = bb
    return cfg


def _concat_row_indices(max_segs: List[int], act_segs: List[int]
                        ) -> np.ndarray:
    """Row gather indices for a kernel whose input is a concat of segments
    stored at ``max_segs`` widths with ``act_segs`` active."""
    idx, base = [], 0
    for m, a in zip(max_segs, act_segs):
        idx.append(np.arange(a) + base)
        base += m
    return np.concatenate(idx)


def _concat_spec(path: Tuple[str, ...], model_cfg: Dict[str, Any],
                 max_arch: Dict[str, Any], arch: Dict[str, Any]
                 ) -> Optional[Tuple[List[int], List[int]]]:
    """(max_segments, active_segments) of the conv input for params that
    consume an elastic concat; None for plain leading-slice params."""
    p = "/".join(path)
    head = dict(model_cfg["decode_head"])
    aux = model_cfg.get("auxiliary_head")
    max_body_w = list(max_arch["backbone"]["body"]["width"])
    act_body_w = list(arch["backbone"]["body"]["width"])

    def stage_io(index):
        idx = index if index >= 0 else 4 + index
        return max_body_w[idx] * 4, act_body_w[idx] * 4

    if head.get("type") in ("DynamicPSPHead", "PSPHead") and \
            p == "decode_head_m/bottleneck/conv/kernel":
        ch = head.get("channels", 512)
        n = len(head.get("pool_scales", (1, 2, 3, 6)))
        m, a = stage_io(head.get("in_index", -1))
        return [m] + [ch] * n, [a] + [ch] * n
    if head.get("type") in ("DynamicUPerHead", "UPerHead") and \
            p == "decode_head_m/psp_bottleneck/conv/kernel":
        ch = head.get("channels", 512)
        n = len(head.get("pool_scales", (1, 2, 3, 6)))
        m, a = stage_io(-1)
        return [m] + [ch] * n, [a] + [ch] * n
    aux_list = aux if isinstance(aux, (list, tuple)) else \
        ([aux] if aux else [])
    for i, a_cfg in enumerate(aux_list):
        if a_cfg.get("type") in ("DynamicFCNHead", "FCNHead") and \
                p == f"aux_heads_{i}/conv_cat/conv/kernel":
            ch = a_cfg.get("channels", 256)
            m, act = stage_io(a_cfg.get("in_index", -1))
            return [m, ch], [act, ch]
    if head.get("type") in ("DynamicFCNHead", "FCNHead") and \
            p == "decode_head_m/conv_cat/conv/kernel":
        ch = head.get("channels", 256)
        m, act = stage_io(head.get("in_index", -1))
        return [m, ch], [act, ch]
    return None


def _slice_leaf(src: jnp.ndarray, tgt_shape: Tuple[int, ...],
                concat: Optional[Tuple[List[int], List[int]]],
                in_axis: int) -> jnp.ndarray:
    src = np.asarray(src)
    if src.shape == tuple(tgt_shape):
        return jnp.asarray(src)
    out = src
    if concat is not None:
        rows = _concat_row_indices(*concat)
        out = np.take(out, rows, axis=in_axis)
    for ax, (s, t) in enumerate(zip(out.shape, tgt_shape)):
        if s != t:
            out = np.take(out, np.arange(t), axis=ax)
    assert out.shape == tuple(tgt_shape), (src.shape, out.shape, tgt_shape)
    return jnp.asarray(out)


def extract_subnet(model_cfg: Dict[str, Any], variables: Dict[str, Any],
                   meta: Optional[Dict[str, Any]] = None,
                   img_size: Tuple[int, int] = (64, 64)
                   ) -> Tuple[Dict[str, Any], Dict[str, Any], Any]:
    """Returns (subnet_model_cfg, subnet_variables, nested_arch)."""
    max_arch = model_max_arch(model_cfg)
    arch = canonical_arch(max_arch, meta)
    sub_cfg = subnet_model_cfg(model_cfg, arch)
    sub_model = build_segmentor(sub_cfg)
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, img_size[0], img_size[1], 3), jnp.bfloat16)
    gt = jnp.zeros((1, img_size[0], img_size[1]), jnp.int32)
    target = jax.eval_shape(
        lambda: sub_model.init({"params": k, "dropout": k}, img, gt,
                               encode_arch(model_max_arch(sub_cfg)),
                               method="forward_train"))

    flat_src = _flatten(variables)
    flat_tgt = _flatten(target)
    out: Dict[Tuple[str, ...], jnp.ndarray] = {}
    for path, leaf in flat_tgt.items():
        if path not in flat_src:
            raise KeyError(f"missing supernet param for {path}")
        # param paths look like ('params', 'backbone_m', ..., 'kernel')
        concat = _concat_spec(path[1:], model_cfg, max_arch, arch)
        in_axis = 2 if path[-1] == "kernel" and len(leaf.shape) == 4 else 0
        out[path] = _slice_leaf(flat_src[path], leaf.shape, concat, in_axis)
    return sub_cfg, _unflatten(out), arch


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()
             ) -> Dict[Tuple[str, ...], Any]:
    flat = {}
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            flat.update(_flatten(v, p))
        else:
            flat[p] = v
    return flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        d = tree
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = v
    return tree


def subnet_name(meta: Dict[str, Any]) -> str:
    return meta_hash(meta)
