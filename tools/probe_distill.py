#!/usr/bin/env python
"""On-chip probe: distillation train-step budget at flagship scale.

VERDICT r3 weak #5: the distiller had never been timed on the chip, so
the teacher's cost in the hot loop had no measured budget. This probe
times the SAME K=8 scan-mode cycle program twice — plain flagship
student vs DynamicDistiller (BEiT-base-shaped random teacher + UPer
teacher head, configs/_dynamic_/models/pspnet_distill_beit.py) — and
reports the teacher-forward overhead per step. Mirrors the reference's
hot loop, where the teacher runs under no_grad inside every train step
(reference gaiaseg/models/segmentors/dynamic_distiller.py:264-274).

Teacher weights are random init (no real .pth on this image — the
conversion path is parity-tested separately in tests/test_vit_convert);
compute cost is identical to converted weights.

Usage: python tools/probe_distill.py [--batch 8] [--crop 512]
           [--iters 3] [--skip-plain] [--device cpu]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def time_cycle(model_cfg, label, args, freeze=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaiaseg_tpu.archspace import build_model_sampler
    from gaiaseg_tpu.engine import create_train_state, make_multi_train_step
    from gaiaseg_tpu.engine.optim import (build_lr_schedule, build_optimizer,
                                          freeze_labels)
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.arch_util import (make_depth_bucketer,
                                              scan_dispatch)
    from gaiaseg_tpu.utils import Config

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

    model = build_segmentor(model_cfg)
    max_arch = model_max_arch(model_cfg)
    sampler = build_model_sampler(Config.fromfile(
        "configs/_dynamic_/model_samplers/ar50to101v2.py")["train_sampler"])
    bucketer = make_depth_bucketer(sampler, max_arch)
    k = 8
    metas = [sampler.sample() for _ in range(k)]
    archs = [encode_arch(max_arch, m) for m in metas]
    scands, sids = scan_dispatch(metas, bucketer)

    schedule = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 1000)
    tx = build_optimizer(
        dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4),
        dict(grad_clip=dict(max_norm=20)), schedule,
        freeze_mask=(lambda p: freeze_labels(p, model_cfg))
        if freeze else None)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (args.batch, args.crop, args.crop, 3),
                            jnp.bfloat16)
    gt = jax.random.randint(rng, (args.batch, args.crop, args.crop), 0, 19)

    t0 = time.perf_counter()
    state = create_train_state(model, rng, img, archs[0], tx)
    fetch(state.params)
    print(f"[{label}] init: {time.perf_counter() - t0:.1f}s", flush=True)

    multi = make_multi_train_step(model, tx, k)
    arch_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *archs)
    imgs_k = jnp.broadcast_to(img, (k,) + img.shape)
    gts_k = jnp.broadcast_to(gt, (k,) + gt.shape)
    rngs_k = jax.random.split(rng, k)
    lrs_k = jnp.asarray([schedule(i) for i in range(k)], jnp.float32)
    bids_k = jnp.asarray(sids, jnp.int32)

    def step():
        nonlocal state
        state, _ = multi(state, imgs_k, gts_k, arch_stack, rngs_k,
                         bucket_ids=bids_k, scan_candidates=scands,
                         lrs=lrs_k, actives=jnp.ones((k,), jnp.int32))
        return state.step

    t0 = time.perf_counter()
    step()
    fetch(state.step)
    print(f"[{label}] first cycle (compile+run): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    step()
    fetch(state.step)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    fetch(state.step)
    dt = (time.perf_counter() - t0) / args.iters / k
    print(f"[{label}] steady: {dt * 1e3:.1f} ms/step -> "
          f"{args.batch / dt:.1f} img/s", flush=True)
    del state
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--skip-plain", action="store_true",
                   help="only time the distill cycle (plain number known)")
    from gaiaseg_tpu.utils.cli import add_device_arg, apply_device
    add_device_arg(p)
    args = p.parse_args()
    apply_device(args)

    from gaiaseg_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    from gaiaseg_tpu.utils import Config
    import __graft_entry__ as ge

    dt_plain = None
    if not args.skip_plain:
        dt_plain = time_cycle(ge._FLAGSHIP, "student-only", args)
    distill_cfg = dict(Config.fromfile(
        "configs/_dynamic_/models/pspnet_distill_beit.py")["model"])
    dt_dist = time_cycle(distill_cfg, "distill", args, freeze=True)
    if dt_plain:
        print(f"teacher overhead: +{(dt_dist - dt_plain) * 1e3:.1f} ms/step "
              f"({dt_dist / dt_plain:.2f}x the plain step)", flush=True)


if __name__ == "__main__":
    main()
