"""Label-space surgery: remap classifier weights between label spaces.

Capability parity with gaiavision ``FCMapLabelSurgeon`` / ``LabelMapping``
referenced by the extraction tool (reference tools/extract_subnet.py:28-29;
usage commented at :139-148): given a mapping from new label ids to old
label ids, rebuild the 1x1 ``conv_seg`` classifier so an extracted subnet
predicts the new label space directly.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np


def remap_classifier(params: Dict[str, Any], label_mapping: Sequence[int],
                     head_path: Sequence[str] = ("decode_head_m",
                                                 "conv_seg"),
                     init_scale: float = 0.0) -> Dict[str, Any]:
    """Return params with the classifier at ``head_path`` remapped.

    ``label_mapping[i]`` = source class for new class ``i``, or -1 for a
    fresh (zero/init_scale-noise) class. Works on HWIO conv kernels and
    biases.
    """
    def remap_leafdict(leaf: Dict[str, Any]) -> Dict[str, Any]:
        kernel = np.asarray(leaf["kernel"])
        new_c = len(label_mapping)
        new_kernel = np.zeros(kernel.shape[:-1] + (new_c,), kernel.dtype)
        rng = np.random.RandomState(0)
        for i, src in enumerate(label_mapping):
            if src >= 0:
                new_kernel[..., i] = kernel[..., src]
            elif init_scale > 0:
                new_kernel[..., i] = rng.randn(
                    *kernel.shape[:-1]) * init_scale
        out = {"kernel": new_kernel}
        if "bias" in leaf:
            bias = np.asarray(leaf["bias"])
            new_bias = np.zeros((new_c,), bias.dtype)
            for i, src in enumerate(label_mapping):
                if src >= 0:
                    new_bias[i] = bias[src]
            out["bias"] = new_bias
        return out

    node = params
    for p in head_path:
        node = node[p]
    return _replace_at(params, list(head_path), remap_leafdict(node))


def _replace_at(tree: Dict[str, Any], path, value) -> Dict[str, Any]:
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _replace_at(tree[path[0]], path[1:], value)
    return out
