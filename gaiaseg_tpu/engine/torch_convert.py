"""torch -> gaiaseg-tpu checkpoint conversion.

The reference initializes supernet backbones from torch ``pretrained``
checkpoints with strict=False (reference dynamic_resnet.py:343-367). This
converter embeds a torchvision-layout ResNet state_dict into the
MAX-shaped DynamicResNet parameter tree: each torch tensor lands in the
leading slice of the corresponding padded supernet array (masks make the
leading slice exactly the active subnet, so an R50-pretrained supernet
evaluated at the R50 anchor reproduces the torch model).

Runs on CPU torch; no torch at runtime on device.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, Tuple

import numpy as np

logger = logging.getLogger("gaiaseg_tpu")


def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _place(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Copy ``src`` into the leading slice of ``dst`` (MAX-shaped)."""
    if src.shape == dst.shape:
        return src.astype(dst.dtype)
    out = np.array(dst)
    sl = tuple(slice(0, s) for s in src.shape)
    out[sl] = src
    return out


def _conv_kernel(t) -> np.ndarray:
    """torch OIHW -> jax HWIO."""
    return _to_np(t).transpose(2, 3, 1, 0)


def resnet_state_dict_to_params(state_dict: Dict[str, Any],
                                params: Dict[str, Any],
                                batch_stats: Dict[str, Any]
                                ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a torchvision-style ResNet state_dict onto DynamicResNet trees.

    Handles: ``conv1/bn1`` stem, ``layer{1-4}.{i}.conv{1-3}/bn{1-3}`` and
    ``downsample.0/1``. Unmatched torch keys (fc.*) are skipped with a log,
    matching the reference's strict=False load.
    """
    import copy
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    bb_p = params["backbone_m"] if "backbone_m" in params else params
    bb_s = batch_stats["backbone_m"] if "backbone_m" in batch_stats \
        else batch_stats

    def put_conv(tree, name, tensor):
        tree[name]["kernel"] = _place(np.asarray(tree[name]["kernel"]),
                                      _conv_kernel(tensor))

    def put_bn(p_tree, s_tree, name, prefix):
        p_tree[name]["scale"] = _place(np.asarray(p_tree[name]["scale"]),
                                       _to_np(state_dict[prefix + ".weight"]))
        p_tree[name]["bias"] = _place(np.asarray(p_tree[name]["bias"]),
                                      _to_np(state_dict[prefix + ".bias"]))
        s_tree[name]["mean"] = _place(
            np.asarray(s_tree[name]["mean"]),
            _to_np(state_dict[prefix + ".running_mean"]))
        s_tree[name]["var"] = _place(
            np.asarray(s_tree[name]["var"]),
            _to_np(state_dict[prefix + ".running_var"]))

    used = set()
    if "conv1.weight" in state_dict:
        put_conv(bb_p["stem0"], "conv", state_dict["conv1.weight"])
        put_bn(bb_p["stem0"], bb_s["stem0"], "bn", "bn1")
        used.update(["conv1.weight", "bn1.weight", "bn1.bias",
                     "bn1.running_mean", "bn1.running_var"])

    def put_conv_stacked(tree, name, row, tensor):
        """Write into row ``row`` of a scan-stacked conv kernel."""
        dst = np.array(tree[name]["kernel"])
        src = _conv_kernel(tensor)
        sl = (row,) + tuple(slice(0, s) for s in src.shape)
        dst[sl] = src
        tree[name]["kernel"] = dst

    def put_bn_stacked(p_tree, s_tree, name, row, prefix):
        for tree, ours, theirs in (
                (p_tree, "scale", ".weight"), (p_tree, "bias", ".bias"),
                (s_tree, "mean", ".running_mean"),
                (s_tree, "var", ".running_var")):
            dst = np.array(tree[name][ours])
            src = _to_np(state_dict[prefix + theirs])
            dst[row, :src.shape[0]] = src
            tree[name][ours] = dst

    pat = re.compile(r"^layer(\d)\.(\d+)\.(conv|bn|downsample)(\d)?"
                     r"(?:\.(\d))?\.(weight|bias|running_mean|running_var)$")
    for key in state_dict:
        m = pat.match(key)
        if not m:
            continue
        stage, block, kind, idx, ds_idx, field = m.groups()
        layer = bb_p.get(f"layer{stage}")
        layer_s = bb_s.get(f"layer{stage}")
        if layer is None:
            continue
        block_i = int(block)
        if block_i == 0:
            blk_p, blk_s = layer["block0"], layer_s["block0"]
            if kind == "conv" and field == "weight":
                put_conv(blk_p, f"conv{idx}", state_dict[key])
                used.add(key)
            elif kind == "bn" and field == "weight":
                put_bn(blk_p, blk_s, f"bn{idx}",
                       f"layer{stage}.{block}.bn{idx}")
            elif kind == "downsample" and ds_idx == "0" and \
                    field == "weight":
                put_conv(blk_p, "downsample_conv", state_dict[key])
                used.add(key)
            elif kind == "downsample" and ds_idx == "1" and \
                    field == "weight":
                put_bn(blk_p, blk_s, "downsample_bn",
                       f"layer{stage}.{block}.downsample.1")
        elif f"block{block}" in layer:
            # unrolled tail blocks: per-block subtrees
            blk_p = layer[f"block{block}"]
            blk_s = layer_s[f"block{block}"]
            if kind == "conv" and field == "weight":
                put_conv(blk_p, f"conv{idx}", state_dict[key])
                used.add(key)
            elif kind == "bn" and field == "weight":
                put_bn(blk_p, blk_s, f"bn{idx}",
                       f"layer{stage}.{block}.bn{idx}")
        elif "blocks" in layer:
            # scan-stacked tail blocks under layer{s}/blocks/b
            blk_p = layer["blocks"]["b"]
            blk_s = layer_s["blocks"]["b"]
            row = block_i - 1
            if row >= np.asarray(blk_p["conv1"]["kernel"]).shape[0]:
                continue
            if kind == "conv" and field == "weight":
                put_conv_stacked(blk_p, f"conv{idx}", row, state_dict[key])
                used.add(key)
            elif kind == "bn" and field == "weight":
                put_bn_stacked(blk_p, blk_s, f"bn{idx}", row,
                               f"layer{stage}.{block}.bn{idx}")

    skipped = [k for k in state_dict
               if k not in used and "num_batches" not in k
               and not any(k.startswith(f"layer{s}.{b}.bn") or
                           k.startswith(f"layer{s}.{b}.downsample.1")
                           for s in "1234" for b in "0123456789")
               and not k.startswith("bn1.")]
    for k in skipped:
        logger.info("torch_convert: skipping %s (strict=False)", k)

    def back(tree, sub):
        if "backbone_m" in tree:
            out = dict(tree)
            out["backbone_m"] = sub
            return out
        return sub

    return back(params, bb_p), back(batch_stats, bb_s)


def load_torch_resnet(path_or_name: str, params, batch_stats):
    """Load from a .pth file or a torchvision model name (e.g. 'resnet50'
    — offline: weights must already be cached or given as a file)."""
    import torch
    if path_or_name.endswith((".pth", ".pt")):
        sd = torch.load(path_or_name, map_location="cpu")
        sd = sd.get("state_dict", sd)
    else:
        import torchvision
        model = getattr(torchvision.models, path_or_name)(weights=None)
        sd = model.state_dict()
    return resnet_state_dict_to_params(sd, params, batch_stats)
