#!/usr/bin/env python
"""One-off probe: decompose bench train-step timing by (variant, bucket).

Times, on the real chip with the warm compile cache:
  - unbounded fast step (round-1 production baseline)
  - bounded fast step per sandwich bucket
  - bounded full (logs+stats) step per bucket
so the production-mix average can be attributed to its components."""
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
    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.engine import create_train_state, make_train_step
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.arch_util import make_depth_bucketer
    from gaiaseg_tpu.utils import Config
    import __graft_entry__ as ge

    cfg = Config.fromfile(ge._FLAGSHIP) if isinstance(ge._FLAGSHIP, str) \
        else ge._FLAGSHIP
    model = build_segmentor(cfg["model"] if "model" in cfg else cfg)
    max_arch = model_max_arch(cfg["model"] if "model" in cfg else cfg)
    s = build_model_sampler(Config.fromfile(
        "configs/_dynamic_/model_samplers/ar50to101v2.py")["train_sampler"])
    bucketer = make_depth_bucketer(s, max_arch)
    metas = [s.sample() for _ in range(8)]
    archs = [encode_arch(max_arch, m) for m in metas]
    bounds = [bucketer(m) for m in metas]

    schedule = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 1000)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9,
                              weight_decay=5e-4),
                         dict(grad_clip=dict(max_norm=20)), schedule)
    fast = make_train_step(model, tx, update_stats=False, with_logs=False)
    full = make_train_step(model, tx, update_stats=True, with_logs=True)

    rng = jax.random.PRNGKey(0)
    batch = 8
    img = jax.random.normal(rng, (batch, 512, 512, 3), jnp.bfloat16)
    gt = jax.random.randint(rng, (batch, 512, 512), 0, 19)
    state = [create_train_state(model, rng, img, archs[0], tx)]

    def run(fn, j, b):
        def f():
            state[0], _ = fn(state[0], img, gt, archs[j], rng, bounds=b)
            return state[0].step
        return f

    # warm every program first (donation-safe: state threads through)
    for j in range(8):
        state[0], _ = fast(state[0], img, gt, archs[j], rng,
                           bounds=bounds[j])
        state[0], _ = full(state[0], img, gt, archs[j], rng,
                           bounds=bounds[j])
    state[0], _ = fast(state[0], img, gt, archs[0], rng, bounds=None)
    state[0], _ = full(state[0], img, gt, archs[0], rng, bounds=None)
    print("warm done", flush=True)

    dt = timeit(run(fast, 0, None))
    print(f"fast unbounded (MAX program): {dt*1e3:8.1f} ms", flush=True)
    for j in range(8):
        d = metas[j].get("arch.backbone.body.depth")
        dt_b = timeit(run(fast, j, bounds[j]))
        print(f"arch{j} depth={d} bucket={bounds[j].body_depth}: "
              f"fast bounded {dt_b*1e3:7.1f} ms", flush=True)
    dt_f = timeit(run(full, 0, bounds[0]))
    print(f"full bounded arch0 (bucket {bounds[0].body_depth}): "
          f"{dt_f*1e3:8.1f} ms", flush=True)
    dt_fu = timeit(run(full, 0, None))
    print(f"full unbounded arch0: {dt_fu*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
