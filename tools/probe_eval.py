#!/usr/bin/env python
"""Ablation probe for whole-mode eval cost at 1024x2048 on the chip.

Times, per variant, the masked supernet at MAX bounds (the population-eval
worst case) so the 29.5 ms/(arch*img) bench number can be attributed:
  feats       backbone forward only
  logits      + decode head (no resize to input res)
  pred        + bilinear resize to 1024x2048 + argmax
  cm          + on-device confusion matrix (the full eval step)
  pred_b2     pred at batch 2 (image-batching amortization)
Usage: python tools/probe_eval.py [chunk]
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


from gaiaseg_tpu.utils.timing import time_fn as timeit  # noqa: E402


def main():
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from gaiaseg_tpu.data.metrics import confusion_matrix
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.ops.resize import resize_bilinear
    import __graft_entry__ as ge

    model = build_segmentor(ge._FLAGSHIP)
    max_arch = model_max_arch(ge._FLAGSHIP)
    arch = encode_arch(max_arch)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 2048, 3), jnp.bfloat16)
    gt = jax.random.randint(rng, (1, 1024, 2048), 0, 19)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
        jnp.zeros((1, 64, 64), jnp.int32), arch, method="forward_train")

    @jax.jit
    def feats(v, im, a):
        return model.apply(v, im, a, method=model.extract_feat)[-1]

    def _logits_fn(m, im, a):
        return m.decode_head_m(m.extract_feat(im, a))

    @jax.jit
    def logits(v, im, a):
        return model.apply(v, im, a, method=_logits_fn)

    @jax.jit
    def pred(v, im, a):
        return model.apply(v, im, a, method=model.simple_test)

    @jax.jit
    def cm(v, im, g, a):
        p = model.apply(v, im, a, method=model.simple_test)
        return confusion_matrix(p, g, 19)

    print(f"feats  : {timeit(lambda: feats(variables, img, arch))*1e3:7.2f} ms")
    print(f"logits : {timeit(lambda: logits(variables, img, arch))*1e3:7.2f} ms")
    print(f"pred   : {timeit(lambda: pred(variables, img, arch))*1e3:7.2f} ms")
    print(f"cm     : {timeit(lambda: cm(variables, img, gt, arch))*1e3:7.2f} ms")

    img2 = jnp.concatenate([img, img])
    dt2 = timeit(lambda: pred(variables, img2, arch))
    print(f"pred b2: {dt2*1e3:7.2f} ms ({dt2/2*1e3:.2f} ms/img)")


if __name__ == "__main__":
    main()
