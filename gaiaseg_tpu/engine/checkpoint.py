"""Checkpointing: msgpack pytrees + JSON meta (+ md5-named subnet ckpts).

Capability parity with the reference checkpoint story (SURVEY.md §5):
CheckpointHook with CLASSES/PALETTE in meta (train_supernet.py:197-202),
``resume_from`` (optimizer+iter state) vs ``load_from`` (weights only,
apis/train.py:172-175), and extract_subnet's standalone md5-of-meta-named
subnet checkpoints (extract_subnet.py:131-133).
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

from ..archspace.meta import meta_hash


def save_checkpoint(path: str, state: Any,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=repr)


def load_checkpoint(path: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of ``target``; returns (state, meta)."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta = {}
    if osp.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(work_dir: str) -> Optional[str]:
    link = osp.join(work_dir, "latest.ckpt")
    return link if osp.exists(link) else None


def update_latest(work_dir: str, ckpt_path: str) -> None:
    link = osp.join(work_dir, "latest.ckpt")
    tmp = link + ".tmp"
    if osp.lexists(tmp):
        os.remove(tmp)
    os.symlink(osp.abspath(ckpt_path), tmp)
    os.replace(tmp, link)


def subnet_ckpt_name(meta: Dict[str, Any]) -> str:
    """md5(json(meta))[:8].ckpt — reference extract_subnet.py:131-133."""
    return f"{meta_hash(meta)}.ckpt"
