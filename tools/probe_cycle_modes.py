#!/usr/bin/env python
"""On-chip probe: cycle-program cost by dispatch mode (scan vs unroll).

Round-3's driver bench died in a ~20-min compile of the UNROLLED K=8
cycle program (193 MB executable; two cache entries with different
draw-order-dependent keys — ~/.cache/gaiaseg_jax jit_multi_step-*), and
the relay's /remote_compile HTTP channel can drop very long compiles
("response body closed before all bytes were read"). SCAN mode
(engine/train.py multi_step scan_candidates path) is the fix: one
lax.scan over a switch body — this probe measures both sides.

Reports, for the requested mode:
  - create_train_state wall (jit_init: one compiled program, vs ~8 min
    of eager per-op init dispatches measured round 4)
  - first multi_step call wall (compile+execute; persistent-cache hit
    on reruns)
  - steady-state ms/step and img/s
  - new persistent-cache entries written (name, size)

Usage: python tools/probe_cycle_modes.py [--mode scan|unroll]
           [--batch 8] [--crop 512] [--iters 3] [--device cpu]
"""
import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="scan", choices=["scan", "unroll"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    from gaiaseg_tpu.utils.cli import add_device_arg, apply_device
    add_device_arg(p)
    args = p.parse_args()
    apply_device(args)

    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.engine import create_train_state, make_multi_train_step
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.arch_util import (cycle_dispatch,
                                              make_depth_bucketer,
                                              scan_dispatch)
    from gaiaseg_tpu.utils import Config
    import __graft_entry__ as ge

    cache_dir = osp.expanduser("~/.cache/gaiaseg_jax")

    def cache_entries():
        try:
            return {f: osp.getsize(osp.join(cache_dir, f))
                    for f in os.listdir(cache_dir)}
        except OSError:
            return {}

    before = cache_entries()

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

    model = build_segmentor(ge._FLAGSHIP)
    max_arch = model_max_arch(ge._FLAGSHIP)
    sampler = build_model_sampler(Config.fromfile(
        "configs/_dynamic_/model_samplers/ar50to101v2.py")["train_sampler"])
    bucketer = make_depth_bucketer(sampler, max_arch)
    k = 8
    metas = [sampler.sample() for _ in range(k)]
    archs = [encode_arch(max_arch, m) for m in metas]
    if args.mode == "scan":
        scands, sids = scan_dispatch(metas, bucketer)
        bseq, bids = None, list(sids)
        print(f"scan: {len(scands)} branches, ids {bids}", flush=True)
    else:
        scands = None
        bseq, bids = cycle_dispatch(metas, bucketer)
        print(f"unroll: seq {[getattr(b, 'body_depth', 'switch') for b in bseq]}"
              f", ids {list(bids)}", flush=True)

    schedule = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 1000)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9,
                              weight_decay=5e-4),
                         dict(grad_clip=dict(max_norm=20)), schedule)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (args.batch, args.crop, args.crop, 3),
                            jnp.bfloat16)
    gt = jax.random.randint(rng, (args.batch, args.crop, args.crop), 0, 19)

    t0 = time.perf_counter()
    state = create_train_state(model, rng, img, archs[0], tx)
    fetch(state.params)
    print(f"create_train_state (jit_init): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    multi = make_multi_train_step(model, tx, k)
    arch_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs)
    imgs_k = jnp.broadcast_to(img, (k,) + img.shape)
    gts_k = jnp.broadcast_to(gt, (k,) + gt.shape)
    rngs_k = jax.random.split(rng, k)
    lrs_k = jnp.asarray([schedule(i) for i in range(k)], jnp.float32)
    bids_k = jnp.asarray(bids or [0] * k, jnp.int32)

    acts_k = None if scands is None else jnp.ones((k,), jnp.int32)

    def step():
        nonlocal state
        state, _ = multi(state, imgs_k, gts_k, arch_stack, rngs_k,
                         bucket_ids=bids_k, bounds_seq=bseq,
                         scan_candidates=scands, lrs=lrs_k,
                         actives=acts_k)
        return state.step

    t0 = time.perf_counter()
    step()
    fetch(state.step)
    print(f"first multi_step (compile+run): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    step()          # warm
    fetch(state.step)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    fetch(state.step)
    dt = (time.perf_counter() - t0) / args.iters / k
    print(f"steady: {dt * 1e3:.1f} ms/step -> "
          f"{args.batch / dt:.1f} img/s", flush=True)

    after = cache_entries()
    new = {f: s for f, s in after.items() if f not in before}
    for f, s in sorted(new.items(), key=lambda kv: -kv[1]):
        print(f"new cache entry: {s / 1e6:7.1f} MB  {f}", flush=True)
    if not new:
        print("no new cache entries (all programs were persistently "
              "cached)", flush=True)


if __name__ == "__main__":
    main()
