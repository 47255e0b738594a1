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


def _place_concat(dst: np.ndarray, src: np.ndarray, n_tail: int,
                  tail_ch: int) -> np.ndarray:
    """Place a torch HWIO kernel whose INPUT is a concat of segments into
    the MAX-shaped supernet kernel: the first segment (elastic backbone
    feature) plus ``n_tail`` static segments of ``tail_ch`` channels each
    (PSP bottleneck / FCN conv_cat — the inverse of extract.py's
    segment-aware row gather, reference psp_head.py:235-239)."""
    act_in, max_in = src.shape[2], dst.shape[2]
    act0 = act_in - n_tail * tail_ch
    max0 = max_in - n_tail * tail_ch
    assert act0 > 0 and max0 >= act0, (src.shape, dst.shape, n_tail, tail_ch)
    rows = np.concatenate(
        [np.arange(act0)] +
        [max0 + j * tail_ch + np.arange(tail_ch) for j in range(n_tail)])
    out = np.array(dst)
    out[np.ix_(range(src.shape[0]), range(src.shape[1]), rows,
               range(src.shape[3]))] = src
    return out


def _stem_state_to_resnet_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Rewrite reference deep-stem keys (``stem.{0,3,6}``/``stem.{1,4,7}``,
    reference dynamic_resnet.py:258-271 Sequential stem) to per-module keys
    our layer{N}/stem{N} mapping consumes."""
    out = dict(sd)
    for k in list(out):
        m = re.match(r"^stem\.(\d+)\.(.+)$", k)
        if not m:
            continue
        idx, field = int(m.group(1)), m.group(2)
        which, role = divmod(idx, 3)
        name = {0: f"stem_conv{which}", 1: f"stem_bn{which}"}.get(role)
        if name:
            out[f"{name}.{field}"] = out.pop(k)
    return out


def _convert_head(sd: Dict[str, Any], p_tree: Dict[str, Any],
                  s_tree: Dict[str, Any], head_cfg: Dict[str, Any]) -> None:
    """Map one reference decode/aux head state_dict (prefix stripped) onto
    our head param/stat subtrees IN PLACE.

    Key layout (reference dynamic_psp_head.py:123-141,
    dynamic_fcn_head.py:76-123, dynamic_uper_head.py:32-72):
      psp_modules.{i}.1.{conv,bn}.*   -> psp_modules/pool{scale_i}
      bottleneck.{conv,bn}.*          -> bottleneck (PSP: concat-aware rows;
                                         UPer: psp_bottleneck)
      convs.{i}.{conv,bn}.*           -> conv{i}
      conv_cat.{conv,bn}.*            -> conv_cat (concat-aware rows)
      lateral_convs.{i}./fpn_convs.{i}. -> lateral{i}/fpn_conv{i}
      fpn_bottleneck.                 -> fpn_bottleneck
      conv_seg.{weight,bias}          -> conv_seg kernel/bias
    """
    htype = str(head_cfg.get("type", ""))
    scales = tuple(head_cfg.get("pool_scales", (1, 2, 3, 6)))
    channels = int(head_cfg.get("channels", 512))
    is_uper = "UPer" in htype

    def put_conv(tree, name, w, n_tail=0):
        src = _conv_kernel(w)
        dst = np.asarray(tree[name]["conv"]["kernel"])
        if n_tail and src.shape[2] != dst.shape[2]:
            tree[name]["conv"]["kernel"] = _place_concat(
                dst, src, n_tail, channels)
        else:
            tree[name]["conv"]["kernel"] = _place(dst, src)

    renames = {"bottleneck": "psp_bottleneck" if is_uper else "bottleneck",
               "fpn_bottleneck": "fpn_bottleneck"}
    for key in sd:
        if key.endswith(".conv.weight"):
            mod = key[:-len(".conv.weight")]
            m = re.match(r"^psp_modules\.(\d+)\.1$", mod)
            if m:
                name = f"pool{scales[int(m.group(1))]}"
                put_conv(p_tree["psp_modules"], name, sd[key])
                put_bn_at = (f"psp_modules.{m.group(1)}.1.bn",
                             p_tree["psp_modules"], s_tree["psp_modules"],
                             name)
            else:
                m2 = re.match(r"^(convs|lateral_convs|fpn_convs)\.(\d+)$",
                              mod)
                if m2:
                    base = {"convs": "conv", "lateral_convs": "lateral",
                            "fpn_convs": "fpn_conv"}[m2.group(1)]
                    name = f"{base}{m2.group(2)}"
                elif mod in renames:
                    name = renames[mod]
                elif mod == "conv_cat":
                    name = "conv_cat"
                else:
                    logger.info("torch_convert: unmapped head conv %s", key)
                    continue
                # concat consumers: first segment is the elastic backbone
                # feature (PSP/UPer bottleneck over [x]+psp_outs, FCN
                # conv_cat over [x, output])
                n_tail = len(scales) if mod == "bottleneck" else \
                    (1 if mod == "conv_cat" else 0)
                put_conv(p_tree, name, sd[key], n_tail=n_tail)
                put_bn_at = (f"{mod}.bn", p_tree, s_tree, name)
            prefix, pt, st, name = put_bn_at
            if prefix + ".weight" in sd:
                _convert_head_bn(sd, pt, st, name, prefix)
    if "conv_seg.weight" in sd:
        p_tree["conv_seg"]["kernel"] = _place(
            np.asarray(p_tree["conv_seg"]["kernel"]),
            _conv_kernel(sd["conv_seg.weight"]))
        if "conv_seg.bias" in sd and "bias" in p_tree["conv_seg"]:
            p_tree["conv_seg"]["bias"] = _place(
                np.asarray(p_tree["conv_seg"]["bias"]),
                _to_np(sd["conv_seg.bias"]))


def _convert_head_bn(sd, p_tree, s_tree, name, prefix):
    for tree, ours, theirs in (
            (p_tree, "scale", ".weight"), (p_tree, "bias", ".bias"),
            (s_tree, "mean", ".running_mean"), (s_tree, "var",
                                                ".running_var")):
        tree[name]["bn"][ours] = _place(
            np.asarray(tree[name]["bn"][ours]), _to_np(sd[prefix + theirs]))


def segmentor_state_dict_to_variables(state_dict: Dict[str, Any],
                                      variables: Dict[str, Any],
                                      model_cfg: Dict[str, Any]
                                      ) -> Dict[str, Any]:
    """Map a reference-format FULL segmentor state_dict (``backbone.*`` +
    ``decode_head.*`` + ``auxiliary_head.*``) onto supernet variables —
    the load path reference tools/extract_subnet.py:91-94 and
    dynamic_distiller.py:195-200 (teacher ckpt) rely on.

    A checkpoint trained at a SUBNET of our MAX space lands in the leading
    slice of every padded array (concat consumers get segment-aware rows),
    so evaluating the supernet at that subnet's anchor reproduces the torch
    model; a reference SUPERNET ckpt (same MAX space) converts exactly.
    """
    import copy
    out = {"params": copy.deepcopy(variables["params"]),
           "batch_stats": copy.deepcopy(variables.get("batch_stats", {}))}
    sd = {k: v for k, v in state_dict.items() if "num_batches" not in k}

    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    # dispatch on the configured backbone family — routing a transformer
    # checkpoint through the ResNet key map would silently skip every
    # backbone key (strict=False style) and keep the random init
    bb_type = str((model_cfg.get("backbone") or {}).get(
        "type", "DynamicResNet"))
    if bb_sd and bb_type in ("BEiT", "Beit"):
        out["params"]["backbone_m"] = beit_state_dict_to_params(
            bb_sd, out["params"]["backbone_m"])
    elif bb_sd and bb_type in ("ElasticTransformer", "ElasticTransformer1"):
        pe = np.asarray(out["params"]["backbone_m"]["pos_embed"])
        ref_grid = int(round((pe.shape[1] - 1) ** 0.5))
        out["params"]["backbone_m"] = vit_state_dict_to_params(
            bb_sd, out["params"]["backbone_m"], ref_grid)
    elif bb_sd and bb_type not in ("DynamicResNet",):
        raise ValueError(
            f"no torch backbone converter for type {bb_type!r} — "
            "convert the checkpoint offline or drop its backbone.* keys")
    elif bb_sd:
        bb_sd = _stem_state_to_resnet_keys(bb_sd)
        # deep-stem rewritten keys: place stem_conv{j}/stem_bn{j} directly
        bb_p = out["params"]["backbone_m"]
        bb_s = out["batch_stats"].get("backbone_m", {})
        for k in list(bb_sd):
            m = re.match(r"^stem_conv(\d)\.weight$", k)
            if m and f"stem{m.group(1)}" in bb_p:
                name = f"stem{m.group(1)}"
                bb_p[name]["conv"]["kernel"] = _place(
                    np.asarray(bb_p[name]["conv"]["kernel"]),
                    _conv_kernel(bb_sd.pop(k)))
            m = re.match(
                r"^stem_bn(\d)\.(weight|bias|running_mean|running_var)$",
                k) if k in bb_sd else None
            if m and f"stem{m.group(1)}" in bb_p:
                name, field = f"stem{m.group(1)}", m.group(2)
                ours = {"weight": ("scale", bb_p), "bias": ("bias", bb_p),
                        "running_mean": ("mean", bb_s),
                        "running_var": ("var", bb_s)}[field]
                key, tree = ours
                tree[name]["bn"][key] = _place(
                    np.asarray(tree[name]["bn"][key]),
                    _to_np(bb_sd.pop(k)))
        if bb_sd:
            new_p, new_s = resnet_state_dict_to_params(
                bb_sd, out["params"], out["batch_stats"])
            out = {"params": new_p, "batch_stats": new_s}

    head_cfg = dict(model_cfg.get("decode_head") or {})
    dh_sd = {k[len("decode_head."):]: v for k, v in sd.items()
             if k.startswith("decode_head.")}
    if dh_sd:
        _convert_head(dh_sd, out["params"]["decode_head_m"],
                      out["batch_stats"].get("decode_head_m", {}), head_cfg)

    aux = model_cfg.get("auxiliary_head")
    aux_list = aux if isinstance(aux, (list, tuple)) else \
        ([aux] if aux else [])
    for i, a_cfg in enumerate(aux_list):
        pref = f"auxiliary_head.{i}." if len(aux_list) > 1 \
            else "auxiliary_head."
        a_sd = {k[len(pref):]: v for k, v in sd.items()
                if k.startswith(pref)}
        name = f"aux_heads_{i}"
        if a_sd and name in out["params"]:
            _convert_head(a_sd, out["params"][name],
                          out["batch_stats"].get(name, {}), dict(a_cfg))
    return out


def load_torch_segmentor(path: str, variables, model_cfg):
    """Load a reference-format full segmentor ``.pth`` into supernet
    variables (reference checkpoints wrap weights in ``state_dict``)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    return segmentor_state_dict_to_variables(sd, variables, model_cfg)


def _lin(tree, name, w, b=None):
    """torch Linear [out,in] (+bias) -> DynLinear kernel [in,out]/bias,
    placed into the leading slice of the MAX-shaped arrays."""
    tree[name]["kernel"] = _place(np.asarray(tree[name]["kernel"]),
                                  _to_np(w).T)
    if b is not None and "bias" in tree[name]:
        tree[name]["bias"] = _place(np.asarray(tree[name]["bias"]),
                                    _to_np(b))


def _ln(tree, name, sd, prefix):
    tree[name]["scale"] = _place(np.asarray(tree[name]["scale"]),
                                 _to_np(sd[prefix + ".weight"]))
    tree[name]["bias"] = _place(np.asarray(tree[name]["bias"]),
                                _to_np(sd[prefix + ".bias"]))


def beit_state_dict_to_params(state_dict: Dict[str, Any],
                              params: Dict[str, Any]) -> Dict[str, Any]:
    """Map an official-BEiT-layout torch state_dict onto our BEiT backbone
    param tree — the distillation-teacher load path (reference
    dynamic_distiller.py:195-200). Rel-pos bias tables whose window differs
    from ours are resampled via the geometric-coordinate surgery
    (engine/ckpt_surgery.py, reference dynamic_distiller.py:55-98).

    Handles: patch_embed.proj, cls_token, per-block norm1/norm2, attn.qkv
    (+BEiT separate q_bias/v_bias, k bias fixed at zero), attn.proj,
    gamma_1/gamma_2, mlp.fc1/fc2, (shared) relative_position_bias_table.
    FPN adapters keep their fresh init (the reference also inits them
    anew, beit.py:326-354)."""
    import copy
    from .ckpt_surgery import resample_rel_pos_bias_table
    p = copy.deepcopy(params)
    sd = state_dict

    if "patch_embed.proj.weight" in sd:
        p["patch_embed"]["kernel"] = _place(
            np.asarray(p["patch_embed"]["kernel"]),
            _conv_kernel(sd["patch_embed.proj.weight"]))
        p["patch_embed"]["bias"] = _place(
            np.asarray(p["patch_embed"]["bias"]),
            _to_np(sd["patch_embed.proj.bias"]))
    if "cls_token" in sd:
        p["cls_token"] = _place(np.asarray(p["cls_token"]),
                                _to_np(sd["cls_token"]))

    def put_table(ours_key, torch_key):
        src = _to_np(sd[torch_key]).astype(np.float32)
        dst = np.asarray(p[ours_key])
        if src.shape != dst.shape:
            extra = 3
            s = (int(round((src.shape[0] - extra) ** 0.5)) + 1) // 2
            d = (int(round((dst.shape[0] - extra) ** 0.5)) + 1) // 2
            src = resample_rel_pos_bias_table(src, s, d)
        p[ours_key] = src.astype(dst.dtype)

    if "rel_pos_bias.relative_position_bias_table" in sd \
            and "rel_pos_bias_table" in p:
        put_table("rel_pos_bias_table",
                  "rel_pos_bias.relative_position_bias_table")

    i = 0
    while f"block{i}" in p:
        blk = p[f"block{i}"]
        pre = f"blocks.{i}."
        if pre + "norm1.weight" not in sd:
            logger.info("torch_convert: no torch weights for block %d", i)
            i += 1
            continue
        _ln(blk, "norm1", sd, pre + "norm1")
        _ln(blk, "norm2", sd, pre + "norm2")
        qkv_w = _to_np(sd[pre + "attn.qkv.weight"])
        qkv_b = None
        if pre + "attn.qkv.bias" in sd:
            qkv_b = _to_np(sd[pre + "attn.qkv.bias"])
        elif pre + "attn.q_bias" in sd:
            qb = _to_np(sd[pre + "attn.q_bias"])
            vb = _to_np(sd[pre + "attn.v_bias"])
            qkv_b = np.concatenate([qb, np.zeros_like(qb), vb])
        _lin(blk, "qkv", qkv_w, qkv_b)
        _lin(blk, "proj", sd[pre + "attn.proj.weight"],
             sd.get(pre + "attn.proj.bias"))
        _lin(blk, "fc1", sd[pre + "mlp.fc1.weight"],
             sd.get(pre + "mlp.fc1.bias"))
        _lin(blk, "fc2", sd[pre + "mlp.fc2.weight"],
             sd.get(pre + "mlp.fc2.bias"))
        for g in ("gamma_1", "gamma_2"):
            if pre + g in sd:
                blk[g] = _place(np.asarray(blk[g]), _to_np(sd[pre + g]))
        if pre + "attn.relative_position_bias_table" in sd and \
                f"rel_pos_bias_table_{i}" in p:
            put_table(f"rel_pos_bias_table_{i}",
                      pre + "attn.relative_position_bias_table")
        i += 1
    return p


def vit_state_dict_to_params(state_dict: Dict[str, Any],
                             params: Dict[str, Any],
                             ref_grid: int) -> Dict[str, Any]:
    """Map a plain-ViT (timm/DeiT layout) torch state_dict onto our
    ElasticTransformer backbone param tree — the elastic-ViT pretrained
    load path (reference elastic_transformer1.py:541-581).

    The fused ``attn.qkv`` weight is split into our w_q/w_k/w_v; everything
    lands in the leading slice of the MAX-shaped arrays (a D-dim ckpt in a
    wider supernet is exactly the subnet at embed width D); ``pos_embed``
    grids are bicubic-resampled to ``ref_grid`` when they differ."""
    import copy
    from .ckpt_surgery import resize_pos_embed
    p = copy.deepcopy(params)
    sd = state_dict

    if "patch_embed.proj.weight" in sd:
        p["patch_embed"]["kernel"] = _place(
            np.asarray(p["patch_embed"]["kernel"]),
            _conv_kernel(sd["patch_embed.proj.weight"]))
        p["patch_embed"]["bias"] = _place(
            np.asarray(p["patch_embed"]["bias"]),
            _to_np(sd["patch_embed.proj.bias"]))
    if "cls_token" in sd:
        p["cls_token"] = _place(np.asarray(p["cls_token"]),
                                _to_np(sd["cls_token"]))
    if "pos_embed" in sd:
        pos = _to_np(sd["pos_embed"]).astype(np.float32)
        src_g = int(round((pos.shape[1] - 1) ** 0.5))
        if src_g != ref_grid:
            pos = resize_pos_embed(pos, (src_g, src_g),
                                   (ref_grid, ref_grid))
        p["pos_embed"] = _place(np.asarray(p["pos_embed"]), pos)

    i = 0
    while f"layer{i}" in p:
        lay = p[f"layer{i}"]
        pre = f"blocks.{i}."
        if pre + "norm1.weight" not in sd:
            logger.info("torch_convert: no torch weights for layer %d", i)
            i += 1
            continue
        _ln(lay, "norm1", sd, pre + "norm1")
        _ln(lay, "norm2", sd, pre + "norm2")
        qkv_w = _to_np(sd[pre + "attn.qkv.weight"])
        d3 = qkv_w.shape[0]
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qkv_b = _to_np(sd[pre + "attn.qkv.bias"]) \
            if pre + "attn.qkv.bias" in sd else np.zeros((d3,), qkv_w.dtype)
        qb, kb, vb = np.split(qkv_b, 3)
        attn = lay["attn"]
        _lin(attn, "w_q", qw, qb)
        _lin(attn, "w_k", kw, kb)
        _lin(attn, "w_v", vw, vb)
        _lin(attn, "proj", sd[pre + "attn.proj.weight"],
             sd.get(pre + "attn.proj.bias"))
        _lin(lay, "fc1", sd[pre + "mlp.fc1.weight"],
             sd.get(pre + "mlp.fc1.bias"))
        _lin(lay, "fc2", sd[pre + "mlp.fc2.weight"],
             sd.get(pre + "mlp.fc2.bias"))
        i += 1
    return p


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
