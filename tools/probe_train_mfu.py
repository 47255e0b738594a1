#!/usr/bin/env python
"""Attribute the train-vs-population MFU gap (VERDICT r4 task 5).

Round-4 rehearsal: population eval sustains 45.9% executed MFU while the
train cycle executes 32.1% — same model, same shapes. This probe times,
at ONE representative bucket's static bounds (512x512, batch 8, the
production crop), each stage of the train step's cost stack:

  fwd_infer      inference forward (simple_test path, what population runs)
  fwd_loss       training forward (dropout + loss chain), value only
  grad           fwd + backward (value_and_grad, no update)
  step_silent    + optimizer update (make_train_step fast path)
  step_full      + BN stat updates + loss logs (the boundary step)
  cycle_pos      the K=8 scan-cycle program / K (the production number)

Each line prints ms, TF/s and executed-MFU using the analytic MACs of the
bounds arch (2*MACs per fwd; grad/step charge 3x fwd — fwd + both
backward passes). The deltas between consecutive lines ARE the
attribution: bwd lowering efficiency, optimizer/mask tax, observability
tax, cycle-dispatch tax.

Usage: python tools/probe_train_mfu.py [--batch 8] [--crop 512]
           [--depth 3 4 6 3] [--device cpu]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop", type=int, default=512)
    p.add_argument("--depth", type=int, nargs=4, default=[3, 4, 6, 3],
                   help="bucket depths (default R50-ish)")
    p.add_argument("--iters", type=int, default=4)
    from gaiaseg_tpu.utils.cli import add_device_arg
    add_device_arg(p)
    return p.parse_args()


def main():
    args = parse_args()
    from gaiaseg_tpu.utils.cli import apply_device
    apply_device(args)
    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.archspace.complexity import get_model_complexity_info
    from gaiaseg_tpu.engine import (create_train_state,
                                    make_multi_train_step, make_train_step)
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.arch_util import (bounds_arch,
                                              make_depth_bucketer,
                                              scan_dispatch)
    from gaiaseg_tpu.utils import Config
    import __graft_entry__ as ge

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

    def timeit(fn, n=args.iters):
        out = fn()
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        fetch(out)
        return (time.perf_counter() - t0) / n

    model = build_segmentor(ge._FLAGSHIP)
    max_arch = model_max_arch(ge._FLAGSHIP)
    meta = {"arch.backbone.stem.width": 64,
            "arch.backbone.body.width": [80, 160, 320, 640],
            "arch.backbone.body.depth": list(args.depth)}
    sampler = build_model_sampler(Config.fromfile(
        "configs/_dynamic_/model_samplers/ar50to101v2.py")["train_sampler"])
    bucketer = make_depth_bucketer(sampler, max_arch)
    bounds = bucketer(meta)
    arch = encode_arch(max_arch, meta)
    gmacs = get_model_complexity_info(
        ge._FLAGSHIP, bounds_arch(max_arch, bounds),
        input_shape=(3, args.crop, args.crop))["flops"] / 1e9
    peak = 197.0  # v5e spec bf16
    print(f"bounds={bounds.body_depth} executed GMACs/img={gmacs:.1f} "
          f"batch={args.batch} crop={args.crop}", flush=True)

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (args.batch, args.crop, args.crop, 3),
                            jnp.bfloat16)
    gt = jax.random.randint(rng, (args.batch, args.crop, args.crop), 0, 19)
    schedule = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 1000)
    tx = build_optimizer(
        dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4),
        dict(grad_clip=dict(max_norm=20)), schedule)
    state = create_train_state(model, rng, img, arch, tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @functools.partial(jax.jit, static_argnames=("b",))
    def fwd_infer(v, im, a, b=None):
        return model.apply(v, im, a, False, b, method=model.simple_test)

    @functools.partial(jax.jit, static_argnames=("b",))
    def fwd_loss(v, im, g, a, r, b=None):
        (total, _), _ = model.apply(v, im, g, a, False, b,
                                    method=model.forward_train,
                                    mutable=[], rngs={"dropout": r})
        return total

    @functools.partial(jax.jit, static_argnames=("b",))
    def grad_only(v, im, g, a, r, b=None):
        def loss_fn(p):
            (total, _), _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, im, g, a,
                False, b, method=model.forward_train, mutable=[],
                rngs={"dropout": r})
            return total
        return jax.grad(loss_fn)(v["params"])

    step_silent = make_train_step(model, tx, update_stats=False,
                                  with_logs=False)
    step_full = make_train_step(model, tx, update_stats=True,
                                with_logs=True)

    def report(name, dt, x_fwd):
        tf = x_fwd * 2 * gmacs * args.batch / dt / 1e3
        print(f"{name:12s}: {dt * 1e3:7.1f} ms  {tf:6.1f} TF/s  "
              f"MFU {tf / peak * 100:5.1f}%  ({x_fwd}x fwd)", flush=True)

    report("fwd_infer", timeit(
        lambda: fwd_infer(variables, img, arch, b=bounds)), 1)
    report("fwd_loss", timeit(
        lambda: fwd_loss(variables, img, gt, arch, rng, b=bounds)), 1)
    report("grad", timeit(
        lambda: grad_only(variables, img, gt, arch, rng, b=bounds)), 3)

    # donated-state steps: thread the returned state
    cur = [state]

    def run_silent():
        cur[0], _ = step_silent(cur[0], img, gt, arch, rng, bounds=bounds)
        return cur[0].step
    report("step_silent", timeit(run_silent), 3)

    cur2 = [create_train_state(model, jax.random.PRNGKey(1), img, arch, tx)]

    def run_full():
        cur2[0], logs = step_full(cur2[0], img, gt, arch, rng,
                                  bounds=bounds)
        return cur2[0].step
    report("step_full", timeit(run_full), 3)

    # the production K=8 scan cycle, per position (all positions at this
    # probe's meta so the executed FLOPs match the bounds above)
    k = 8
    metas = [meta] * k
    scands, sids = scan_dispatch(metas, bucketer)
    if scands is not None:
        multi = make_multi_train_step(model, tx, k)
        archs = [encode_arch(max_arch, m) for m in metas]
        arch_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *archs)
        imgs_k = jnp.broadcast_to(img, (k,) + img.shape)
        gts_k = jnp.broadcast_to(gt, (k,) + gt.shape)
        rngs_k = jax.random.split(rng, k)
        lrs_k = jnp.asarray([schedule(i) for i in range(k)], jnp.float32)
        acts_k = jnp.ones((k,), jnp.int32)
        cur3 = [create_train_state(model, jax.random.PRNGKey(2), img,
                                   arch, tx)]

        def run_cycle():
            cur3[0], _ = multi(cur3[0], imgs_k, gts_k, arch_stack, rngs_k,
                               bucket_ids=jnp.asarray(sids, jnp.int32),
                               scan_candidates=scands, lrs=lrs_k,
                               actives=acts_k)
            return cur3[0].step
        report("cycle_pos", timeit(run_cycle, 2) / k, 3)


if __name__ == "__main__":
    main()
