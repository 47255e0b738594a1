#!/usr/bin/env python
"""Convert a trained segmentor checkpoint into a distiller TEACHER ckpt.

Remaps the student-side subtrees of an our-format checkpoint
(``params.backbone_m`` / ``params.decode_head_m`` / ``params.neck_m``)
into the distiller's frozen-teacher subtrees (``t_backbone`` /
``t_decode_head`` / ``t_neck``), producing the our-format teacher
checkpoint `engine/train.py load_teacher_checkpoint` consumes. This is
the self-distillation path: a trained supernet (at MAX arch) teaches a
fresh student — the same mechanism the reference drives with a
converted BEiT .pth (reference dynamic_distiller.py:195-200); for a
torch teacher pass the .pth straight to ``teacher_checkpoint`` instead.

Usage: python tools/make_teacher_ckpt.py <trained.ckpt> <teacher_out.ckpt>
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

_REMAP = {"backbone_m": "t_backbone", "decode_head_m": "t_decode_head",
          "neck_m": "t_neck"}


def convert(src_path: str, dst_path: str) -> dict:
    from flax import serialization

    with open(src_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    out = {"params": {}, "batch_stats": {}}
    for col in ("params", "batch_stats"):
        tree = raw.get(col) or {}
        for student_key, teacher_key in _REMAP.items():
            if student_key in tree:
                out[col][teacher_key] = tree[student_key]
    if not out["params"]:
        raise ValueError(
            f"{src_path} has no student subtrees {sorted(_REMAP)} — "
            f"params keys: {sorted((raw.get('params') or {}))}")
    with open(dst_path, "wb") as f:
        f.write(serialization.to_bytes(out))
    return out


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    out = convert(src, dst)
    print(f"teacher ckpt written: {dst} "
          f"(params: {sorted(out['params'])}, "
          f"stats: {sorted(out['batch_stats'])})")
