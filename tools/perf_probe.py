#!/usr/bin/env python
"""Micro A/B probes for the supernet train step on real hardware: isolates
the cost of (a) fwd vs fwd+bwd, (b) the label-resolution logit upsample +
CE, (c) the decode/aux heads. Prints one timing line per variant."""
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
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    from gaiaseg_tpu.models.losses import softmax_cross_entropy
    from gaiaseg_tpu.ops.resize import resize_bilinear
    import __graft_entry__ as ge

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    model = build_segmentor(ge._FLAGSHIP)
    max_arch = model_max_arch(ge._FLAGSHIP)
    arch = encode_arch(max_arch)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, 512, 512, 3), jnp.bfloat16)
    gt = jax.random.randint(rng, (batch, 512, 512), 0, 19)
    gt_small = gt[:, ::32, ::32]  # decode-head (PSP in_index 3) resolution
    k = jax.random.PRNGKey(1)
    variables = model.init({"params": k, "dropout": k}, img, gt, arch,
                           method="forward_train")
    params = variables["params"]
    bs = variables["batch_stats"]

    def fwd_feats(p):
        feats = model.apply({"params": p, "batch_stats": bs}, img, arch,
                            train=False, method="extract_feat")
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def loss_full(p):
        (total, _), _ = model.apply(
            {"params": p, "batch_stats": bs}, img, gt, arch,
            method="forward_train", mutable=["batch_stats"],
            rngs={"dropout": k})
        return total

    def loss_small_labels(p):
        # CE at logit resolution (64x64): no 8x logit upsample in the graph
        feats = model.apply({"params": p, "batch_stats": bs}, img, arch,
                            train=False, method="extract_feat")
        logit = model.apply({"params": p, "batch_stats": bs}, feats,
                            train=False, method=lambda m, f, train:
                            m.decode_head_m(f, train=train))
        return softmax_cross_entropy(logit, gt_small)

    probes = {
        "fwd_backbone+heads(no loss)": jax.jit(fwd_feats),
        "train fwd+bwd full": jax.jit(jax.grad(loss_full)),
        "train fwd+bwd CE@1/8 (no upsample)": jax.jit(
            jax.grad(loss_small_labels)),
    }
    for name, fn in probes.items():
        dt = timeit(lambda: fn(params))
        print(f"{name}: {dt * 1e3:.1f} ms -> {batch / dt:.1f} img/s",
              flush=True)


if __name__ == "__main__" and (len(sys.argv) <= 2
                                or sys.argv[2] != "opt"):
    main()


def probe_optimizer(batch=8):
    """Isolate the optimizer/update cost of the full train step."""
    from gaiaseg_tpu.engine import create_train_state, make_train_step
    from gaiaseg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from gaiaseg_tpu.models import (build_segmentor, encode_arch,
                                    model_max_arch)
    import __graft_entry__ as ge

    model = build_segmentor(ge._FLAGSHIP)
    arch = encode_arch(model_max_arch(ge._FLAGSHIP))
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, 512, 512, 3), jnp.bfloat16)
    gt = jax.random.randint(rng, (batch, 512, 512), 0, 19)
    schedule = build_lr_schedule(dict(policy="poly", power=0.9), 0.01, 1000)

    variants = {
        "sgd+mom+wd+clip": build_optimizer(
            dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4),
            dict(grad_clip=dict(max_norm=20)), schedule),
        "sgd+mom (no clip/wd)": build_optimizer(
            dict(type="SGD", lr=0.01, momentum=0.9), None, schedule),
        "plain sgd": build_optimizer(dict(type="SGD", lr=0.01), None,
                                     schedule),
    }
    for name, tx in variants.items():
        state = create_train_state(model, rng, img, arch, tx)
        step = make_train_step(model, tx)
        holder = [state]

        def f():
            holder[0], logs = step(holder[0], img, gt, arch, rng)
            return logs["decode.loss_seg"]

        dt = timeit(f)
        print(f"full step [{name}]: {dt * 1e3:.1f} ms -> "
              f"{batch / dt:.1f} img/s", flush=True)
        del holder, state


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "opt":
    probe_optimizer(int(sys.argv[1]))
