#!/usr/bin/env python
"""Slide-inference ablation at 1024x2048, R50 exact bounds, on the chip.

Decomposes the masked-bounded slide step. NOTE the real grid at
1024x2048 / crop 512x1024 / stride 341x683 is NINE windows (3x3) — the
first version of this probe used 6 and undercounted slide cost ~1.5x:
  crops_fwd   9-window batch through backbone+head logits (no upsample)
  crops_up    + per-window bilinear upsample to crop res
  slide       the full production slide_inference (+ scatter-accumulate)
  whole       whole-mode inference at the same bounds, for reference
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
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.arch_util import exact_bounds
    from gaiaseg_tpu.ops.resize import resize_bilinear
    import __graft_entry__ as ge
    from functools import partial

    model = build_segmentor(ge._FLAGSHIP)
    max_arch = model_max_arch(ge._FLAGSHIP)
    r50_meta = {"arch.backbone.stem.width": 64,
                "arch.backbone.body.width": [64, 128, 256, 512],
                "arch.backbone.body.depth": [3, 4, 6, 3]}
    arch = encode_arch(max_arch, r50_meta)
    bounds = exact_bounds(max_arch, r50_meta)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 2048, 3), jnp.bfloat16)
    crops = jax.random.normal(rng, (9, 512, 1024, 3), jnp.bfloat16)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
        jnp.zeros((1, 64, 64), jnp.int32), arch, method="forward_train")

    def _logits_fn(m, im, a, b):
        return m.decode_head_m(m.extract_feat(im, a, bounds=b))

    @partial(jax.jit, static_argnames=("b",))
    def crops_fwd(v, im, a, b=None):
        return model.apply(v, im, a, b, method=_logits_fn)

    def _up_fn(m, im, a, b):
        lg = m.decode_head_m(m.extract_feat(im, a, bounds=b))
        return resize_bilinear(lg, im.shape[1:3], m.align_corners)

    @partial(jax.jit, static_argnames=("b",))
    def crops_up(v, im, a, b=None):
        return model.apply(v, im, a, b, method=_up_fn)

    @partial(jax.jit, static_argnames=("b",))
    def slide(v, im, a, b=None):
        return model.apply(v, im, a, (512, 1024), (341, 683), b,
                           method=model.slide_inference)

    @partial(jax.jit, static_argnames=("b",))
    def whole(v, im, a, b=None):
        return model.apply(v, im, a, b, method=model.whole_inference)

    for name, fn in [
        ("whole 1024x2048", lambda: whole(variables, img, arch, b=bounds)),
        ("crops_fwd 9x512x1024",
         lambda: crops_fwd(variables, crops, arch, b=bounds)),
        ("crops_up 9x512x1024",
         lambda: crops_up(variables, crops, arch, b=bounds)),
        ("slide full", lambda: slide(variables, img, arch, b=bounds)),
    ]:
        print(f"{name:22s}: {timeit(fn)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__" and "--epi" not in sys.argv:
    main()


def epilogue_probe():
    """Isolate the overlap-accumulate epilogue on dummy window logits."""
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    h, w, hc, wc, C = 1024, 2048, 512, 1024, 19
    origins = []
    for i in range(3):
        for j in range(3):
            origins.append((min(i * 341, h - hc), min(j * 683, w - wc)))
    logits = jax.random.normal(rng, (9, 1, hc, wc, C), jnp.bfloat16)

    @jax.jit
    def epi(lg):
        preds = None
        for k, (y0, x0) in enumerate(origins):
            p = jnp.pad(lg[k], ((0, 0), (y0, h - hc - y0),
                                (x0, w - wc - x0), (0, 0)))
            preds = p.astype(jnp.float32) if preds is None else preds + p
        count = np.zeros((1, h, w, 1), np.float32)
        for (y0, x0) in origins:
            count[:, y0:y0 + hc, x0:x0 + wc] += 1.0
        return preds / jnp.asarray(count)

    @jax.jit
    def epi_nopad(lg):
        return jnp.sum(lg.astype(jnp.float32), axis=0)

    print(f"epilogue pad+sum+div  : {timeit(lambda: epi(logits))*1e3:7.2f} ms",
          flush=True)
    print(f"sum-only (no pads)    : "
          f"{timeit(lambda: epi_nopad(logits))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__" and "--epi" in sys.argv:
    epilogue_probe()
