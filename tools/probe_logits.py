#!/usr/bin/env python
"""Logit-chain layout ablation at 1024x2048 on the chip.

The decode head emits [N, H/8, W/8, 19] and the eval chain upsamples to
full res, softmaxes, argmaxes. With C=19 in the minor (lane) dim, TPU
tiling pads 19 -> 128, so every full-res logit tensor costs ~6.7x its
nominal bytes in HBM traffic. This probe times the chain in both layouts
to decide whether the inference paths should carry logits channel-first:

  up_nhwc        resize [1,128,256,19] -> [1,1024,2048,19] (current)
  up_sm_am_nhwc  + softmax + argmax (current simple_test chain)
  up_am_nhwc     + argmax only (softmax skipped: same argmax)
  up_nchw        transpose at head res -> resize [1,19,1024,2048]
  up_am_nchw     + argmax over axis 1
  cm_from_pred   one-hot matmul confusion matrix from [1,1024,2048] pred

Usage: python tools/probe_logits.py
"""
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gaiaseg_tpu.utils.timing import time_fn as timeit  # noqa: E402


def main():
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from gaiaseg_tpu.data.metrics import confusion_matrix

    rng = jax.random.PRNGKey(0)
    C, H, W = 19, 1024, 2048
    logit = jax.random.normal(rng, (1, H // 8, W // 8, C), jnp.bfloat16)
    gt = jax.random.randint(rng, (1, H, W), 0, C)

    @jax.jit
    def up_nhwc(x):
        return jax.image.resize(x, (1, H, W, C), "bilinear",
                                antialias=False)

    @jax.jit
    def up_sm_am_nhwc(x):
        y = jax.image.resize(x, (1, H, W, C), "bilinear", antialias=False)
        return jnp.argmax(jax.nn.softmax(y.astype(jnp.float32), -1), -1)

    @jax.jit
    def up_am_nhwc(x):
        y = jax.image.resize(x, (1, H, W, C), "bilinear", antialias=False)
        return jnp.argmax(y, -1)

    @jax.jit
    def up_nchw(x):
        xt = jnp.transpose(x, (0, 3, 1, 2))
        return jax.image.resize(xt, (1, C, H, W), "bilinear",
                                antialias=False)

    @jax.jit
    def up_am_nchw(x):
        xt = jnp.transpose(x, (0, 3, 1, 2))
        y = jax.image.resize(xt, (1, C, H, W), "bilinear", antialias=False)
        return jnp.argmax(y, 1)

    pred = jnp.argmax(up_nchw(logit), 1)

    @jax.jit
    def cm_from_pred(p, g):
        return confusion_matrix(p, g, C)

    for name, fn in [
        ("up_nhwc", lambda: up_nhwc(logit)),
        ("up_sm_am_nhwc", lambda: up_sm_am_nhwc(logit)),
        ("up_am_nhwc", lambda: up_am_nhwc(logit)),
        ("up_nchw", lambda: up_nchw(logit)),
        ("up_am_nchw", lambda: up_am_nchw(logit)),
        ("cm_from_pred", lambda: cm_from_pred(pred, gt)),
    ]:
        print(f"{name:14s}: {timeit(fn) * 1e3:7.2f} ms")

    # train-side: grad of (upsample-to-label-res + CE) through a dummy
    # projection, both layouts — the flagship step resizes [8,64,64,19]
    # logits to 512x512 labels for the loss (dynamic_decode_head.py:219-239
    # semantics), fwd AND bwd paying the C=19 lane pad in NHWC
    from gaiaseg_tpu.models.losses import softmax_cross_entropy
    B, hw, HW = 8, 64, 512
    feat = jax.random.normal(rng, (B, hw, hw, 256), jnp.bfloat16)
    w = jax.random.normal(rng, (256, C), jnp.bfloat16) * 0.05
    gt_t = jax.random.randint(rng, (B, HW, HW), 0, C)

    @jax.jit
    def ce_nhwc_grad(w):
        def loss(w):
            lg = (feat @ w).astype(jnp.bfloat16)
            lg = jax.image.resize(lg, (B, HW, HW, C), "bilinear",
                                  antialias=False)
            return softmax_cross_entropy(lg, gt_t)
        return jax.grad(loss)(w)

    @jax.jit
    def ce_nchw_grad(w):
        def loss(w):
            lg = (feat @ w).astype(jnp.bfloat16)
            lg = jnp.transpose(lg, (0, 3, 1, 2))
            lg = jax.image.resize(lg, (B, C, HW, HW), "bilinear",
                                  antialias=False)
            # CE over axis 1
            lse = jax.nn.logsumexp(lg.astype(jnp.float32), axis=1)
            oh = jax.nn.one_hot(gt_t, C, axis=1, dtype=lg.dtype)
            picked = (lg.astype(jnp.float32) * oh).sum(axis=1)
            return (lse - picked).mean()
        return jax.grad(loss)(w)

    for name, fn in [("ce_nhwc_grad", lambda: ce_nhwc_grad(w)),
                     ("ce_nchw_grad", lambda: ce_nchw_grad(w))]:
        print(f"{name:14s}: {timeit(fn) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
