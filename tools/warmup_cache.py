#!/usr/bin/env python
"""Precompile the production train programs into the persistent XLA cache.

A supernet training run with ``steps_per_dispatch=8`` compiles one
unrolled cycle program per distinct bounds sequence (anchors exact +
one covering bucket for the random slots — engine/train.py). Each
compile takes 10-20 min on the relay; hitting them mid-run stalls
training. This tool compiles every reachable variant up front (cached in
~/.cache/gaiaseg_jax, reused by all later runs of the same config/batch).

Usage:
  python tools/warmup_cache.py <config> [--batch 8] [--crop 512]
      [--max-variants N] [--device cpu]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop", type=int, default=512)
    p.add_argument("--max-variants", type=int, default=None,
                   help="stop after N cycle variants (default: all)")
    p.add_argument("--cycle-mode", default="scan",
                   choices=["scan", "unroll", "both"],
                   help="which cycle program(s) to warm; must match the "
                        "run's cycle_mode (default scan, the production "
                        "default)")
    p.add_argument("--sampler", default=None,
                   help="config file providing train_sampler when the "
                        "model config does not (e.g. "
                        "configs/_dynamic_/model_samplers/ar50to101v2.py)")
    p.add_argument("--e2e", action="store_true",
                   help="also pre-stage bench.py's e2e train-loop "
                        "programs (device-cached + streaming feed, "
                        "jit_init, augment) by driving its e2e sections "
                        "once — the section shares compile keys with the "
                        "bench by construction")
    from gaiaseg_tpu.utils.cli import add_device_arg
    add_device_arg(p)
    return p.parse_args()


def main():
    args = parse_args()
    from gaiaseg_tpu.utils.cli import apply_device
    apply_device(args)
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.engine import (create_train_state,
                                    make_multi_train_step, make_train_step)
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.arch_util import (cycle_dispatch,
                                              make_depth_bucketer,
                                              scan_dispatch)
    from gaiaseg_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    model = build_segmentor(cfg["model"],
                            test_cfg=cfg["model"].get("test_cfg"))
    max_arch = model_max_arch(cfg["model"])
    sampler_cfg = cfg.get("train_sampler") or Config.fromfile(
        args.sampler)["train_sampler"]
    sampler = build_model_sampler(sampler_cfg)
    # rand_k must match engine/train.py: the BoundsSwitch candidate set is
    # part of the cycle program's compile key, so a different rand_k here
    # precompiles programs production never runs
    bucketer = make_depth_bucketer(
        sampler, max_arch, rand_k=int(cfg.get("arch_bounds_rand_k", 6)))

    # enumerate reachable cycle variants by replaying the sampler through
    # the SAME shared enumeration the train loop dispatches
    # (arch_util.cycle_dispatch) — a hand-rolled mirror here would drift
    # and silently reintroduce mid-run compiles. With BoundsSwitch
    # dispatch the random positions are runtime-selected branches, so the
    # static-key variant count is normally ONE.
    k = int(cfg.get("steps_per_dispatch", 8))
    cycle, variants, ids_of = None, [], {}
    for _ in range(64):
        metas = [sampler.sample() for _ in range(k)]
        if cycle is None:
            cycle = metas
        bseq, bids = cycle_dispatch(metas, bucketer)
        if bseq is not None and bseq not in variants:
            variants.append(bseq)
            ids_of[bseq] = bids
    print(f"{len(variants)} reachable cycle variants (k={k})", flush=True)

    sched_cfg = cfg.get("lr_config") or dict(policy="poly", power=0.9)
    schedule = build_lr_schedule(sched_cfg, 0.01, 1000)
    tx = build_optimizer(cfg.get("optimizer") or dict(type="SGD", lr=0.01),
                         cfg.get("optimizer_config"), schedule)

    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((args.batch, args.crop, args.crop, 3), jnp.bfloat16)
    gt = jnp.zeros((args.batch, args.crop, args.crop), jnp.int32)
    archs = [encode_arch(max_arch, m) for m in (cycle * 3)[:k]]
    arch_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs)
    imgs_k = jnp.broadcast_to(img, (k,) + img.shape)
    gts_k = jnp.broadcast_to(gt, (k,) + gt.shape)
    rngs_k = jax.random.split(rng, k)

    def fetch(x):
        # block_until_ready is a NO-OP on the relay backend: a scalar
        # device->host copy is the only reliable sync (see verify skill)
        import numpy as np
        return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

    state = create_train_state(model, rng, img, archs[0], tx)
    full = make_train_step(model, tx, update_stats=True, with_logs=True)
    t0 = time.time()
    state, _ = full(state, img, gt, archs[0], rng)
    fetch(state.params)
    print(f"full (logging/BN) step: {time.time() - t0:.0f}s", flush=True)

    multi = make_multi_train_step(model, tx, k)
    if args.max_variants is not None:
        variants = variants[:args.max_variants]
    # lr values are data (injected-lr optimizer state), so ONE set of
    # programs serves every schedule/run length — pass the vector to
    # match the production dispatch exactly
    lrs_k = jnp.asarray([schedule(i) for i in range(k)], jnp.float32)
    if args.cycle_mode in ("scan", "both"):
        # the production default: ONE lax.scan-over-switch program whose
        # static key (the bucketer's candidate table) is draw-order
        # independent — warming it covers EVERY future cycle of this
        # config/batch/crop
        scands, sids = scan_dispatch(cycle, bucketer)
        if scands is None:
            print("scan dispatch unavailable (unbounded space); skipping",
                  flush=True)
        else:
            t0 = time.time()
            state, _ = multi(state, imgs_k, gts_k, arch_stack, rngs_k,
                             bucket_ids=jnp.asarray(sids, jnp.int32),
                             scan_candidates=scands, lrs=lrs_k,
                             actives=jnp.ones((k,), jnp.int32))
            fetch(state.params)
            print(f"scan cycle program ({len(scands)} branches): "
                  f"{time.time() - t0:.0f}s", flush=True)
    if args.cycle_mode in ("unroll", "both"):
        for i, bseq in enumerate(variants):
            t0 = time.time()
            state, _ = multi(state, imgs_k, gts_k, arch_stack, rngs_k,
                             bucket_ids=jnp.asarray(ids_of[bseq],
                                                    jnp.int32),
                             bounds_seq=bseq, lrs=lrs_k)
            fetch(state.params)
            print(f"[{i + 1}/{len(variants)}] cycle variant "
                  f"{[getattr(b, 'body_depth', 'switch') for b in bseq]}: "
                  f"{time.time() - t0:.0f}s", flush=True)
    if args.e2e:
        # drive bench.py's own e2e sections (cached first — the flagship
        # production feed): every program they compile lands in the
        # persistent cache under the exact key a driver bench run uses
        import bench
        t0 = time.time()
        R = {"train_batch": args.batch}
        bctx = {}
        bench._setup(R, bctx)
        bench._sec_e2e(R, bctx, cached=True)
        print(f"e2e (device-cached) warm: {time.time() - t0:.0f}s",
              flush=True)
        t0 = time.time()
        bench._sec_e2e(R, bctx, cached=False)
        print(f"e2e (streaming) warm: {time.time() - t0:.0f}s", flush=True)
    print("warmup done; programs persisted in the compilation cache",
          flush=True)


if __name__ == "__main__":
    main()
