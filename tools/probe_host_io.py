#!/usr/bin/env python
"""Host->device batch-feed ablation for the train hot loop, on the chip.

The e2e train loop (engine/train.py) uploads K=8 raw batches per cycle
dispatch and runs one augment program per batch; the bench measured the
whole loop at ~30 img/s steady-state vs 206 img/s dispatch-only — this
probe attributes the gap:

  up_img_1      upload ONE [8,512,512,3] u8 batch (jnp.asarray + sync)
  up_gt_i32     upload its [8,512,512] int32 labels
  up_gt_u8      same labels as uint8 (4x fewer bytes)
  up_cycle_8    8 separate img+gt uploads (the current per-cycle cost)
  up_cycle_1    ONE stacked [64,512,512,3] img (+gt) upload
  aug_1         one augment_batch dispatch+exec on resident arrays
  aug_cycle_8   8 augment dispatches (current)
  aug_cycle_1   ONE augment over the flattened [64,...] stack
  stack_k       jnp.stack of 8 resident [8,...] batches (device concat)

Usage: python tools/probe_host_io.py
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def timeit(fn, n=4):
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from gaiaseg_tpu.data.transforms import augment_batch

    B, H, W, K = 8, 512, 512, 8
    rng = np.random.RandomState(0)
    img_np = rng.randint(0, 255, (B, H, W, 3), np.uint8)
    gt_np_i32 = rng.randint(0, 19, (B, H, W)).astype(np.int32)
    gt_np_u8 = gt_np_i32.astype(np.uint8)
    imgs_np = np.broadcast_to(img_np, (K,) + img_np.shape).reshape(
        K * B, H, W, 3).copy()
    gts_np = np.broadcast_to(gt_np_i32, (K,) + gt_np_i32.shape).reshape(
        K * B, H, W).copy()

    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    kk = jax.random.PRNGKey(0)

    def aug(im, gt):
        return augment_batch(kk, im, gt, mean, std, crop_size=(H, W),
                             ratio_range=(0.5, 2.0), cat_max_ratio=0.75,
                             num_classes=19)

    img_dev = jnp.asarray(img_np)
    gt_dev = jnp.asarray(gt_np_i32)
    batches = [aug(img_dev, gt_dev) for _ in range(K)]
    for b in batches:
        fetch(b)

    cases = [
        ("up_img_1", lambda: jnp.asarray(img_np)),
        ("up_gt_i32", lambda: jnp.asarray(gt_np_i32)),
        ("up_gt_u8", lambda: jnp.asarray(gt_np_u8)),
        ("up_cycle_8", lambda: [jnp.asarray(img_np) + 0
                                for _ in range(K)][-1]),
        ("up_cycle_1", lambda: jnp.asarray(imgs_np)),
        ("aug_1", lambda: aug(img_dev, gt_dev)),
        ("aug_cycle_8", lambda: [aug(img_dev, gt_dev)
                                 for _ in range(K)][-1]),
        ("aug_cycle_1", lambda: aug(jnp.asarray(imgs_np),
                                    jnp.asarray(gts_np))),
        ("stack_k", lambda: jnp.stack([b["img"] for b in batches])),
    ]
    for name, fn in cases:
        print(f"{name:12s}: {timeit(fn) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
